package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Pack

/** Every declared query returns rows on sf0.001 (the driver's t1-style
  * smoke, applied to the whole pack — catches empty-result and
  * plan-breaking regressions before the oracle gate). */
class PackSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique (a collision would silently drop a query)") {
    val dups = Pack.all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate names: ${dups.mkString(",")}")
    assert(Pack.byName.size == Pack.all.size)
  }

  test("every oracle-checked query has SQL and every name is well-formed") {
    Pack.all.foreach { q =>
      assert(q.name.matches("[a-z0-9_]+"), s"${q.name}: driver-safe names only")
      q.oracle.foreach(sql => assert(sql.trim.toUpperCase.startsWith("SELECT")
        || sql.trim.toUpperCase.startsWith("WITH"), s"${q.name}: odd oracle"))
    }
  }

  // Driver-hash hazard: DuckDB widens sum(INTEGER/BIGINT) to HUGEINT while
  // Spark stays int64; the typed-cell hash then diverges even when values
  // are equal (bit window_islands in r4). Any oracle sum aliased to a column
  // the Spark plan types as integer must be CAST(... AS BIGINT).
  test("pack invariant: integer-typed oracle sum() aliases are CAST-wrapped") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val sumStart = "(?i)\\bsum\\s*\\(".r
    def uncastIntegerSums(sql: String, intCols: Set[String]): Seq[String] =
      sumStart.findAllMatchIn(sql).flatMap { m =>
        // Only the final (paren-depth-0) SELECT list types the output;
        // CTE-internal sums are fine when the outer query re-casts them.
        val before = sql.take(m.start)
        val depth0 = before.count(_ == '(') == before.count(_ == ')')
        val open = sql.indexOf('(', m.start)
        var depth = 0; var j = open; var end = -1
        while (j < sql.length && end < 0) {
          sql(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        if (!depth0 || end < 0) None
        else {
          val wrapped = before.toLowerCase.replaceAll("\\s+$", "").endsWith("cast(")
          val alias = "(?is)^\\s+as\\s+([a-z_][a-z0-9_]*)".r
            .findFirstMatchIn(sql.substring(end + 1)).map(_.group(1).toLowerCase)
          alias.filter(a => !wrapped && intCols(a))
        }
      }.toSeq
    val offenders = Pack.all
      .filter(q => q.oracle.exists(o => sumStart.findFirstIn(o).isDefined))
      .flatMap { q =>
        val intCols = q.fn(spark, TestSpark.sf0001).schema.fields.collect {
          case f if f.dataType == LongType || f.dataType == IntegerType =>
            f.name.toLowerCase
        }.toSet
        uncastIntegerSums(q.oracle.get, intCols).map(a => s"${q.name}.$a")
      }
    assert(offenders.isEmpty,
      s"uncast integer sum() -> DuckDB HUGEINT hash divergence: ${offenders.mkString(", ")}")
  }

  /** Queries whose CORRECT sf0.001 answer is the empty set, with the
    * structural reason — and a replacement non-emptiness gate at sf0.01
    * below, so "empty" stays a verified property, not an excuse. */
  private val emptyAtSf0001: Map[String, String] = Map(
    "graph_common_neighbors" ->
      ("sf0.001's co-purchase graph is the complete K10 (10 suppliers, " +
        "every pair co-occurs) - link prediction over non-edges has " +
        "nothing to predict; non-edges appear from sf0.01 up"))

  Pack.all.foreach { q =>
    if (emptyAtSf0001.contains(q.name))
      test(s"${q.name} is empty at sf0.001 (complete graph) but returns rows at sf0.01") {
        assert(q.fn(spark, TestSpark.sf0001).count() == 0, emptyAtSf0001(q.name))
        assert(q.fn(spark, "/root/testdata/sf0.01").count() > 0, q.name)
      }
    else
      test(s"${q.name} returns rows at sf0.001") {
        assert(q.fn(spark, TestSpark.sf0001).count() > 0, q.name)
      }
  }
}
