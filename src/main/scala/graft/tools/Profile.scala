package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stagewise profiler for the slow bench queries: isolates construction
  * cost from parse/join/write cost so optimization goes where time is.
  * Usage: runMain graft.tools.Profile [sfDir] [names...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(n: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime; val r = f
        ((System.nanoTime - t0) / 1e9, r)
      }
      println(f"TIME $n%-28s min ${ts.map(_._1).min}%.3f s  (runs ${ts.map(t => f"${t._1}%.2f").mkString(" ")}; rows ${ts.head._2})")
    }

    // u1 stages
    if (names.isEmpty || names.contains("u1")) {
      val texts = graft.queries.PackParsers.ticketTexts(spark, d)
      time("u1_construct_only")(texts.count())
      time("u1_construct+len")(texts.select(sum(length($"text"))).as[Long].head())
      time("u1_full") {
        texts.select($"text").as[String]
          .flatMap(graft.parsers.TicketParser.parse _).count()
      }
      val full = graft.queries.Pack.byName("u1_udtf_ticket_items").fn
      time("u1_declared")(full(spark, d).count())
      val sorted = graft.queries.PackParsers.ticketTextsSorted(spark, d)
      time("u1_sorted_construct")(sorted.select(sum(length($"text"))).as[Long].head())
      time("u1_sorted_full") {
        sorted.select($"text").as[String]
          .flatMap(graft.parsers.TicketParser.parse _).count()
      }
    }

    if (names.isEmpty || names.contains("u2")) {
      val full = graft.queries.Pack.byName("u2_udf_mail_fields").fn
      time("u2_docs_only")(graft.queries.PackParsers.mailDocs(spark, d)
        .select(sum(length($"html_body"))).as[Long].head())
      time("u2_declared")(full(spark, d).count())
    }

    if (names.isEmpty || names.contains("k3")) {
      val full = graft.queries.Pack.byName("k3_sink_warehouse_append").fn
      time("k3_declared")(full(spark, d).count())
    }

    if (names.isEmpty || names.contains("minhash")) {
      val full = graft.queries.Pack.byName("dedup_minhash_lsh").fn
      time("minhash_declared")(full(spark, d).count())
      val docs = graft.schemas.Tables.documents(spark, d)
      time("minhash_sigs_groupby") {
        graft.ext.TextDedup.minhashSignatures(docs, "doc_id", "text", 16)
          .agg(count(lit(1))).as[Long].head()
      }
      time("minhash_sigs_typedagg") {
        graft.plans.MinHashAgg.register(spark)
        docs.select($"doc_id", graft.ext.TextDedup.tokens($"text").as("toks"))
          .groupBy($"doc_id")
          .agg(call_function("graft_minhash", $"toks").as("sig"))
          .agg(count(lit(1))).as[Long].head()
      }
    }

    if (names.isEmpty || names.contains("cc")) {
      val full = graft.queries.Pack.byName("dedup_cluster_cc").fn
      time("cc_declared")(full(spark, d).count())
      val docs = graft.schemas.Tables.documents(spark, d).filter($"doc_id" < 128)
      time("cc_pairs_only") {
        graft.ext.TextDedup.simhashPairs(
          graft.ext.TextDedup.simhash(docs, "doc_id", "text"), 12).count()
      }
    }

    if (names.isEmpty || names.contains("j5")) {
      val full = graft.queries.Pack.byName("j5_join_equi_adhoc").fn
      time("j5_declared")(full(spark, d).count())
    }

    if (names.isEmpty || names.contains("k5")) {
      val full = graft.queries.Pack.byName("k5_sink_bulk_copy").fn
      time("k5_declared")(full(spark, d).count())
    }

    if (names.isEmpty || names.contains("f6")) {
      val full = graft.queries.Pack.byName("f6_project_const_broadcast").fn
      time("f6_declared")(full(spark, d).count())
    }

    if (names.contains("dupfrac")) {
      import graft.schemas.Tables
      import graft.ext.TextDedup
      val docs = Tables.documents(spark, d)
      val g = docs.select($"doc_id",
        explode(TextDedup.shingles($"text", 3)).as("gram"))
      time("df_explode_only")(g.count())
      val w = g.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"gram")))
      time("df_window")(w.count())
      time("df_full")(TextDedup.duplicateShingleFraction(docs, "doc_id", "text", 3).count())
      val byCount = g.groupBy($"gram").agg(count(lit(1)).as("df"))
      time("df_joinback")(
        g.join(byCount, Seq("gram"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when($"df" >= 2, 1L).otherwise(0L)).as("n_dup")).count())
    }

    if (names.contains("pagerank")) {
      import graft.schemas.Tables
      val edges = Tables.lineitem(spark, d).select($"l_orderkey", $"l_suppkey")
        .join(Tables.orders(spark, d).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select(concat(lit("c"), $"o_custkey").as("src"),
          concat(lit("s"), $"l_suppkey").as("dst"))
        .distinct()
      time("pr_edges_only")(edges.count())
      time("pr_1iter")(graft.ext.Graph.pageRank(edges, 1).count())
      time("pr_3iter")(graft.ext.Graph.pageRank(edges, 3).count())
      time("pr_5iter")(graft.ext.Graph.pageRank(edges, 5).count())
    }

    spark.stop()
  }
}
