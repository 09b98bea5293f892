package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Pack

/** Plan inspection utility:
  * `sbt "runMain graft.tools.Explain <sfDir> [queryName...]"`
  * prints the AQE-final physical plan per declared query (all queries when
  * none named). Used to audit broadcast choices, pushed filters, pruned
  * schemas, and codegen coverage after every operator change. */
object Explain {
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
      println(s"#PLAN# $n")
      try {
        val df = Pack.byName(n).fn(spark, sfDir)
        df.count() // materialize so AQE shows the final plan
        println(df.queryExecution.executedPlan.toString)
      } catch { case e: Exception => println(s"  failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
