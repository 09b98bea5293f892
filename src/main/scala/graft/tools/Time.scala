package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Pack

/** Steady-state timing for a subset of declared queries:
  * `sbt "runMain graft.tools.Time <sfDir> <queryName...>"` — one warmup
  * run then one timed run each. */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Pack.all.map(_.name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = Pack.byName(n).fn
      fn(spark, sfDir).count()
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"TIME $n ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    spark.stop()
  }
}
