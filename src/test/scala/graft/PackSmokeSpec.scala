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

  Pack.all.foreach { q =>
    test(s"${q.name} returns rows at sf0.001") {
      assert(q.fn(spark, TestSpark.sf0001).count() > 0, q.name)
    }
  }
}
