package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Pack

/** Partition-count invariance — the README's standing claim, now a
  * standing test: declared results must not depend on
  * `spark.sql.shuffle.partitions`. The chosen set covers the families
  * where partitioning bugs actually surface: double aggregation
  * (order-sensitive float sums), windows over cumulative state, salted
  * skew rewrites, chunked prefix sums, rank-based quantiles, LSH
  * banding, connected components (superstep fixpoints), and top-k
  * fusion. Everything runs twice at sf0.001 — the default 4 partitions
  * and a coprime 7 — and must collect byte-identically. */
class PartitionInvarianceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val queries = Seq(
    "q1_agg",                    // decimal-summed aggregates
    "agg_salted_skew",           // two-level salted fold-out
    "window_running_sum",        // cumulative window state
    "mixture_token_budget",      // chunked two-level prefix sum
    "text_quality_filter_quantile", // rank-rule quantile
    "text_ccnet_buckets",        // per-source tertile labeling
    "dedup_minhash_lsh",         // banded self-join + bucket guard
    "dedup_cluster_cc",          // iterative superstep fixpoint
    "retrieval_hybrid_rrf",      // two-list rank fusion
    "graph_pagerank",            // decimal-quantized iteration
    "text_line_dedup",           // salted line counts + ordered rebuild md5
    "graph_triangle_count",      // orientation + wedge-join closure counts
    "stats_ks_test",             // integer ECDF products over window cumsums
    "ts_anomaly_rolling",        // decimal rolling moments + double z threshold
    "mixture_temperature_weights", // quantized-decimal sqrt normalizer
    "mine_hard_negatives",       // broadcast scoring + bounded-heap ranks
    "ts_autocorr_lag1",          // lag-window pairs + decimal moment corr
    "stats_cov_matrix",          // ten-moment single-pass decimal covariances
    "ts_cusum_drift",            // hour-ordered running deviation peak
    "window_twap",               // decimal interval-weighted numerator
    "stats_benford_digits",      // integer-string digit histogram
    // round-10 additions where partitioning bugs would surface:
    "graph_label_propagation",   // per-round modal votes + min-label ties
    "dedup_containment",         // salted df caps + directed expand
    "stats_quantile_binned",     // binned cumsum + cross-multiply rank
    "sample_balance_sources",    // md5-uniform accepts against broadcast marginals
    "retrieval_recall_mrr_eval", // two rankings joined into integer metrics
    "agg_bitmap_distinct",       // OR-merged bitmap buffers + popcount sums
    "split_leakage_safe",        // band candidates + signature-agreement verify
    "k16_sink_training_shards",  // global chunked cumsum shard assignment
    "ann_ivfpq_topk",            // probe routing + decimal ADC sums + heap top-k
    "k17_sink_scd2_apply",       // change-point windows + band-bounded rewrite
    "pipeline_curation_e2e")     // five chained stages, one manifest

  private def collectAt(name: String, partitions: String): Seq[String] = {
    // cold per run: a BoundedCache'd intermediate (minhash signatures,
    // band frames, tf-idf weights) persisted by the FIRST run would
    // otherwise serve the second partition count from cached blocks,
    // hiding a partition-sensitive bug in exactly the stage under test
    graft.ext.BoundedCache.clear()
    spark.catalog.clearCache()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    try Pack.byName(name).fn(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  queries.foreach { name =>
    test(s"$name is invariant to the shuffle partition count (4 vs 7)") {
      assert(collectAt(name, "4") == collectAt(name, "7"),
        s"$name changed results under a different partitioning — " +
          "an order-sensitive fold or rank leaked into the answer")
    }
  }
}
