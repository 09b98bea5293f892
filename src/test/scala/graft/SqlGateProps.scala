package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

/** Property fuzz over the two-layer generated-SQL gate (VERDICT r16 #3).
  *
  * The hand batteries in IoSpec caught `EXCEPT ALL` only because someone
  * thought to write it — an allowlist's failure modes are exactly the
  * shapes nobody enumerated. Two properties close that class:
  *
  *  - ACCEPT: a generator of read-only SELECTs over the three allowlisted
  *    tables (projections, predicates, aggregates, windows, DISTINCT,
  *    set ops, joins, CTEs, scalar/EXISTS subqueries, sort/limit/offset,
  *    composed to depth 2) must pass BOTH gate layers with the tables
  *    registered — i.e. with real analysis, so layer 2's structural
  *    allowlist sees every node the composition can produce.
  *  - REJECT: the same safe statements with a forbidden fragment injected
  *    (foreign relation — top-level, joined, CTE-laundered, or
  *    UNION-smuggled; write nodes; reflection exprs; IDENTIFIER()
  *    deferral; EXECUTE IMMEDIATE; TRANSFORM ... USING; INSERT OVERWRITE
  *    DIRECTORY) must still PARSE (the IoSpec canary discipline: a
  *    mutation that stopped parsing proves nothing about the gate) and
  *    then be rejected by the gate's own IllegalArgumentException — not
  *    by an incidental error class.
  */
object SqlGateProps extends Properties("sql-gate") {

  private lazy val spark = TestSpark.spark
  private val allowed = Seq("carrefour_data", "mp_data", "bank_payments")

  /** Register the three allowlisted tables with a uniform schema, run the
    * body, always deregister — each case is hermetic so suite ordering
    * (IoSpec's own mp_data fixtures, the layer-2 skip test) never sees
    * leftover views. */
  private def withViews[A](body: => A): A = {
    allowed.foreach { t =>
      spark.range(20)
        .select(col("id").as("k"), (col("id") % 3).cast("string").as("categ"),
          (col("id") * 1.5).as("amt"))
        .createOrReplaceTempView(t)
    }
    try body
    finally allowed.foreach(spark.catalog.dropTempView(_): Unit)
  }

  private val tableGen: Gen[String] = Gen.oneOf(allowed)
  private val predGen: Gen[String] = Gen.oneOf(
    "amt > 3.0", "k % 2 = 0", "categ = '1'", "amt IS NOT NULL",
    "k IN (1, 2, 3)", "categ LIKE '%1%'", "k BETWEEN 2 AND 15")

  /** Leaf SELECT shapes — one per analyzed-node family a generator can
    * reach without composition. Every shape exposes columns (k, categ,
    * amt) so the combinators below can compose any of them blindly. */
  private val leafGen: Gen[String] = {
    val simple = for {
      t <- tableGen; p <- predGen
      n <- Gen.choose(1, 25)
    } yield s"SELECT k, categ, amt FROM $t WHERE $p ORDER BY k LIMIT $n"
    val agg = for { t <- tableGen; p <- predGen } yield
      s"SELECT max(k) AS k, categ, sum(amt) AS amt FROM $t WHERE $p " +
        "GROUP BY categ HAVING count(*) >= 0"
    val window = for { t <- tableGen } yield
      s"SELECT k, categ, avg(amt) OVER (PARTITION BY categ ORDER BY k) AS amt FROM $t"
    val distinct = for { t <- tableGen } yield
      s"SELECT DISTINCT k, categ, amt FROM $t"
    val scalarSub = for { t1 <- tableGen; t2 <- tableGen } yield
      s"SELECT k, categ, amt FROM $t1 WHERE amt >= (SELECT min(amt) FROM $t2)"
    val existsSub = for { t1 <- tableGen; t2 <- tableGen } yield
      s"SELECT k, categ, amt FROM $t1 a WHERE EXISTS " +
        s"(SELECT 1 FROM $t2 b WHERE b.k = a.k)"
    val join = for { t1 <- tableGen; t2 <- tableGen; p <- predGen } yield
      s"SELECT a.k AS k, a.categ AS categ, b.amt AS amt " +
        s"FROM $t1 a JOIN $t2 b ON a.k = b.k WHERE a.$p"
    Gen.oneOf(simple, agg, window, distinct, scalarSub, existsSub, join)
  }

  /** Compose leaves with CTE / UNION / EXCEPT / derived-table wrappers. */
  private def sqlGen(depth: Int): Gen[String] =
    if (depth == 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> (for { inner <- sqlGen(depth - 1); n <- Gen.choose(1, 20) } yield
        s"WITH cte0 AS ($inner) SELECT k, categ, amt FROM cte0 ORDER BY k LIMIT $n"),
      2 -> (for { a <- sqlGen(depth - 1); b <- leafGen } yield
        s"SELECT * FROM ($a) u1 UNION ALL SELECT * FROM ($b) u2"),
      1 -> (for { a <- sqlGen(depth - 1); b <- leafGen } yield
        s"SELECT * FROM ($a) e1 EXCEPT ALL SELECT * FROM ($b) e2"),
      1 -> (for { inner <- sqlGen(depth - 1); p <- predGen } yield
        s"SELECT k, categ, amt FROM ($inner) d WHERE $p"))

  private val safeGen: Gen[String] = sqlGen(2)

  property("every generated read-only SELECT passes both gate layers") =
    Prop.forAll(safeGen) { sql =>
      withViews {
        // analysis must actually run (tables registered), so a false
        // rejection here is layer 2's — the allowlist gap class
        graft.io.AgentSupport.validateSql(spark, sql, allowed)
        Prop.passed
      }
    }

  /** Forbidden-fragment injections. Each takes a SAFE statement and
    * returns SQL that must parse and then gate-reject. */
  private val mutationGen: Gen[(String, String => String)] = Gen.oneOf(
    ("foreign relation (top-level join)",
      (s: String) => s"SELECT * FROM ($s) x JOIN secrets ON true"),
    ("foreign relation (UNION-smuggled)",
      (s: String) => s"SELECT * FROM ($s) x UNION ALL SELECT * FROM secrets"),
    ("foreign relation (CTE-laundered body)",
      (s: String) => s"WITH w AS (SELECT * FROM secrets) SELECT * FROM ($s) x"),
    ("foreign relation (subquery expression)",
      (s: String) => s"SELECT * FROM ($s) x WHERE amt > (SELECT max(z) FROM hidden)"),
    ("write (INSERT INTO an allowed table)",
      (s: String) => s"INSERT INTO mp_data SELECT * FROM ($s) x"),
    ("write (CTAS command)",
      (s: String) => s"CREATE TABLE exfil AS SELECT * FROM ($s) x"),
    ("write (INSERT OVERWRITE DIRECTORY)",
      (s: String) => s"INSERT OVERWRITE DIRECTORY '/tmp/exfil' USING parquet SELECT * FROM ($s) x"),
    ("reflection expression",
      (s: String) => s"SELECT reflect('java.lang.System', 'lineSeparator') AS r FROM ($s) x"),
    ("reflection via java_method",
      (s: String) => s"SELECT java_method('java.lang.System', 'getenv') AS r FROM ($s) x"),
    ("IDENTIFIER() deferred relation",
      (s: String) => s"SELECT * FROM ($s) x JOIN IDENTIFIER('mp_data') i ON true"),
    ("IDENTIFIER() deferred function",
      (s: String) => s"SELECT IDENTIFIER('reflect')('java.lang.System','lineSeparator') FROM ($s) x"),
    ("dynamic SQL (EXECUTE IMMEDIATE)",
      (_: String) => "EXECUTE IMMEDIATE 'SELECT 1'"),
    ("OS pipe (TRANSFORM ... USING)",
      (_: String) => "SELECT TRANSFORM(categ) USING 'cat' AS (c STRING) FROM mp_data"))

  property("every forbidden-fragment injection parses, then gate-rejects") =
    Prop.forAll(safeGen, mutationGen) { case (safe, (label, mutate)) =>
      withViews {
        val sql = mutate(safe)
        // canary discipline (IoSpec r14): the statement must still PARSE —
        // a mutation that stopped parsing would "pass" for the wrong reason
        spark.sessionState.sqlParser.parsePlan(sql)
        try {
          graft.io.AgentSupport.validateSql(spark, sql, allowed)
          Prop.falsified :| s"$label NOT rejected: $sql"
        } catch {
          case _: IllegalArgumentException => Prop.passed
          case e: Throwable => Prop.falsified :|
            s"$label rejected by ${e.getClass.getName}, not the gate: $sql"
        }
      }
    }
}
