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

  Pack.all.foreach { q =>
    test(s"${q.name} returns rows at sf0.001") {
      assert(q.fn(spark, TestSpark.sf0001).count() > 0, q.name)
    }
  }
}
