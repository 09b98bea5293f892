package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.schemas.Tables

/** Scale-pattern query pack: each query is the distributed-systems shape a
  * 100 TB pipeline actually needs — skew-salted aggregation, deterministic
  * hash splits, runtime-filter-pruned joins, time-series gap fill — while
  * staying value-equal to a simple relational oracle, so the exactness gate
  * still covers them.
  *
  * These patterns are demonstrated explicitly even where AQE could do an
  * equivalent rewrite at runtime (skew-join split, runtime bloom filters):
  * the explicit forms work on any plan shape, including aggregations,
  * which AQE's skew handling does not cover.
  */
object PackScale {
  private val D = DecimalType(18, 2)
  private def dec(c: Column): Column = c.cast(D)

  val queries: Seq[QDef] = Seq(

    // Two-phase salted aggregation: the skew-proof form of a low-cardinality
    // GROUP BY. Phase 1 fans each hot key across 16 salted sub-keys (partial
    // sums shrink the shuffle to |keys|×16 rows); phase 2 folds the salts
    // out. Decimal partials make the result order-free ⇒ identical to the
    // plain GROUP BY oracle. At 100 TB a returnflag-style 3-group aggregate
    // without salting would route a third of the table through one reducer.
    QDef("agg_salted_skew",
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(count(lit(1)).as("pn"), sum(dec(col("l_extendedprice"))).as("ps"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("pn")).cast("long").as("n"), sum(col("ps")).cast("double").as("total"))
        .orderBy(col("l_returnflag"))
    },

    // Deterministic train/test split: bucket = first hex nibble of
    // md5(doc_id), train = buckets 0-12 (~81%). Content-addressed splits
    // survive re-partitioning, re-ingestion, and engine changes — unlike
    // rand()-based sampling, the same row lands in the same split on every
    // engine and every run.
    QDef("split_train_test",
      """SELECT doc_id,
        |  CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INTEGER) AS bucket,
        |  CASE WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13
        |       THEN 'train' ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val bucket = graft.ops.Ops.hashBucket16(col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), bucket.as("bucket"),
          when(bucket < 13, "train").otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    },

    // Runtime-filter-pruned semi join: a Bloom filter built from the small
    // (filtered) build side prunes the probe scan before the exact semi
    // join — the explicit form of Spark's runtime bloom-filter pushdown.
    // The Bloom pass admits false positives only, and the exact semi join
    // removes them ⇒ value-equal to the plain EXISTS oracle. At scale this
    // turns "shuffle 100 TB of lineitem" into "shuffle the ~0.2% that might
    // match".
    QDef("join_semi_bloom",
      """SELECT l.l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) { (s, d) =>
      val build = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
      val bloom = build.stat.bloomFilter("o_orderkey", 100000, 0.01)
      val bloomBc = s.sparkContext.broadcast(bloom)
      val mightContain = udf((k: Long) => bloomBc.value.mightContain(k))
      Tables.lineitem(s, d)
        .filter(mightContain(col("l_orderkey")))
        .join(build, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(dec(col("l_extendedprice"))).cast("double").as("total"))
        .orderBy(col("l_returnflag"))
    },

    // Time-series resample with gap fill: per-user daily activity, missing
    // days materialized as zero over each user's own [first, last] span.
    // sequence+explode generates days *per user* (data-proportional, no
    // driver-side calendar), and the left join back is keyed on
    // (user, day) — partition-parallel at any scale.
    QDef("resample_gapfill",
      """WITH daily AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS cnt
        |               FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
        |days AS (SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |         FROM span)
        |SELECT d.user_id, d.day, COALESCE(daily.cnt, 0) AS n
        |FROM days d LEFT JOIN daily USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("cnt"))
      val days = daily
        .groupBy(col("user_id")).agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      days.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"), coalesce(col("cnt"), lit(0L)).as("n"))
        .orderBy(col("user_id"), col("day"))
    },

    // Incremental aggregate maintenance (materialized-view update): the
    // orders aggregate is maintained by folding three arrival batches
    // through Ops.incrementalAgg — history is never rescanned, yet the
    // result must equal the one-shot GROUP BY oracle exactly
    // (count/sum/min/max are decomposable; the sum is decimal so
    // maintenance order cannot perturb it).
    QDef("agg_incremental_maintenance",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val batches = Seq(
        o.filter(col("o_orderkey") % 3 === 0),
        o.filter(col("o_orderkey") % 3 === 1),
        o.filter(col("o_orderkey") % 3 === 2))
      batches.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) { (prev, b) =>
          Some(graft.ops.Ops.incrementalAgg(prev, b, Seq("o_orderpriority"), "o_totalprice"))
        }.get
        .select(col("o_orderpriority"), col("n"), col("total").cast("double").as("total"),
          col("mn"), col("mx"))
        .orderBy(col("o_orderpriority"))
    },

    // Incremental JOIN-view maintenance: the orders⋈lineitem aggregate
    // is maintained across two arrival batches PER SIDE with the IVM
    // delta rule (Ops.joinDelta: ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) feeding
    // Ops.incrementalAgg — history is never re-joined, each refresh
    // costs the arrival size, yet the state must equal the one-shot
    // join GROUP BY exactly (decimal sums make fold order irrelevant).
    QDef("agg_incremental_join_maintenance",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS total,
        |  min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
      // deliberately misaligned splits so every delta term joins rows
      // across batches
      val oBatches = Seq(o.filter(col("o_orderkey") % 2 === 0),
        o.filter(col("o_orderkey") % 2 === 1))
      val lBatches = Seq(l.filter(col("o_orderkey") % 3 === 0),
        l.filter(col("o_orderkey") % 3 =!= 0))
      var accO = o.limit(0)
      var accL = l.limit(0)
      var state = Option.empty[org.apache.spark.sql.DataFrame]
      oBatches.zip(lBatches).foreach { case (dO, dL) =>
        val delta = graft.ops.Ops.joinDelta(accO, dO, accL, dL, Seq("o_orderkey"))
        state = Some(graft.ops.Ops.incrementalAgg(
          state, delta, Seq("o_orderpriority"), "l_extendedprice"))
        accO = accO.unionByName(dO)
        accL = accL.unionByName(dL)
      }
      state.get
        .select(col("o_orderpriority"), col("n"),
          col("total").cast("double").as("total"), col("mn"), col("mx"))
        .orderBy(col("o_orderpriority"))
    },

    // Data-quality report (the dbt-test / expectations surface): range,
    // referential-integrity, null, and uniqueness rules evaluated in one
    // pass each — violations counted, never materialized. The orphan
    // check is an anti join (broadcastable key set); the dup check is a
    // group-count. A real deployment gates the load on `violations = 0`.
    QDef("dq_report",
      """SELECT 'lineitem_dup_key' AS rule, CAST(count(*) AS BIGINT) AS violations FROM (
        |  SELECT l_orderkey, l_linenumber, count(*) AS c FROM lineitem
        |  GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'lineitem_orphan_order', count(*) FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'lineitem_qty_range', count(*) FROM lineitem
        |WHERE l_quantity < 1 OR l_quantity > 50
        |UNION ALL
        |SELECT 'orders_null_date', count(*) FROM orders WHERE o_orderdate IS NULL
        |ORDER BY rule""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val dupKey = li.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem_dup_key").as("rule"), col("violations"))
      val orphans = graft.ops.Ops
        .antiJoinLarge(li.select(col("l_orderkey")), o.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"))
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem_orphan_order").as("rule"), col("violations"))
      val qtyRange = li.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem_qty_range").as("rule"), col("violations"))
      val nullDate = o.filter(col("o_orderdate").isNull)
        .agg(count(lit(1)).as("violations"))
        .select(lit("orders_null_date").as("rule"), col("violations"))
      dupKey.unionByName(orphans).unionByName(qtyRange).unionByName(nullDate)
        .orderBy(col("rule"))
    },

    // Column-stats profile (the ANALYZE TABLE surface): count / non-null /
    // exact distinct / min / max for several columns in ONE scan — the
    // multi-distinct aggregate lowers to a single Expand pass, and stack()
    // reshapes the one-row result without rescanning. The oracle pays three
    // scans for the same numbers.
    QDef("stats_column_profile",
      """SELECT 'o_orderkey' AS col, count(*) AS n, count(o_orderkey) AS non_null,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS DOUBLE) AS min_v, CAST(max(o_orderkey) AS DOUBLE) AS max_v
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(o_custkey), count(DISTINCT o_custkey),
        |  CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(o_totalprice), count(DISTINCT o_totalprice),
        |  min(o_totalprice), max(o_totalprice) FROM orders
        |ORDER BY col""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .agg(count(lit(1)).as("n"),
          count(col("o_orderkey")).as("nn1"), countDistinct(col("o_orderkey")).as("nd1"),
          min(col("o_orderkey")).cast("double").as("mn1"),
          max(col("o_orderkey")).cast("double").as("mx1"),
          count(col("o_custkey")).as("nn2"), countDistinct(col("o_custkey")).as("nd2"),
          min(col("o_custkey")).cast("double").as("mn2"),
          max(col("o_custkey")).cast("double").as("mx2"),
          count(col("o_totalprice")).as("nn3"), countDistinct(col("o_totalprice")).as("nd3"),
          min(col("o_totalprice")).as("mn3"), max(col("o_totalprice")).as("mx3"))
        .selectExpr(
          """stack(3,
            |  'o_orderkey',   n, nn1, nd1, mn1, mx1,
            |  'o_custkey',    n, nn2, nd2, mn2, mx2,
            |  'o_totalprice', n, nn3, nd3, mn3, mx3)
            |AS (col, n, non_null, n_distinct, min_v, max_v)""".stripMargin)
        .orderBy(col("col"))
    },

    // Per-key top-k through the custom TopKPerKey operator (LogicalPlan +
    // Strategy + SparkPlan, graft.plans): one exchange + bounded heap per
    // key, O(n log k), no partition sort — vs the window form's full sort
    // of every partition to keep 3 rows each. Value-equal to the
    // row_number oracle; ties impossible (event_id is unique).
    QDef("sort_topk_per_key",
      """WITH r AS (SELECT event_id, user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |SELECT event_id, user_id, value FROM r WHERE rn <= 3
        |ORDER BY user_id, value DESC, event_id""".stripMargin) { (s, d) =>
      graft.ops.Ops.topKPerKey(
          Tables.events(s, d).select(col("event_id"), col("user_id"), col("value")),
          Seq("user_id"), Seq(("value", true), ("event_id", false)), k = 3)
        .orderBy(col("user_id"), col("value").desc, col("event_id"))
    },

    // Keep-latest-version dedup: the CDC/compaction staple — one surviving
    // row per key, newest timestamp wins, event_id breaks exact-ts ties so
    // the survivor is deterministic. Runs through the custom TopKPerKey
    // operator (k=1): one hash exchange + a single-slot heap per key — no
    // per-partition sort at all, where the window row_number form sorts
    // every partition fully to keep one row each. At 100 TB this is the
    // standard "latest snapshot from an append log" pass.
    QDef("dedup_keep_latest",
      """WITH r AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_id, user_id, ts, event_type, value FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      graft.ops.Ops.topKPerKey(
          Tables.events(s, d)
            .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value")),
          Seq("user_id"), Seq(("ts", true), ("event_id", true)), k = 1)
        .orderBy(col("user_id"))
    },

    // Deterministic uniform sampling by hash rank (bottom-k): the k
    // smallest md5(id) per stratum form an exact-size uniform sample
    // that is identical on every engine, run and partitioning — the
    // reproducible alternative to rand() sampling for eval/debug sets.
    // Runs through the custom TopKPerKey operator: one exchange + a
    // k-slot heap per stratum instead of a full per-partition sort; at
    // 100 TB the heap never holds more than k rows per key.
    QDef("sample_bottomk",
      """WITH r AS (SELECT event_id, user_id, event_type,
        |             md5(CAST(event_id AS VARCHAR)) AS h,
        |             row_number() OVER (PARTITION BY event_type
        |               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
        |           FROM events)
        |SELECT event_id, user_id, event_type, h FROM r WHERE rn <= 100
        |ORDER BY event_type, h""".stripMargin) { (s, d) =>
      graft.ops.Ops.topKPerKey(
          Tables.events(s, d)
            .select(col("event_id"), col("user_id"), col("event_type"),
              md5(col("event_id").cast("string")).as("h")),
          Seq("event_type"), Seq(("h", false), ("event_id", false)), k = 100)
        .orderBy(col("event_type"), col("h"))
    },

    // Skew-salted join as a declared query (the join-side counterpart of
    // agg_salted_skew): the dim side replicates saltFactor ways, the fact
    // side scatters by a stable key hash, so one hot key spreads over
    // saltFactor reducers instead of melting a single task. Value-equal
    // to the plain equi-join the oracle runs.
    QDef("join_skew_salted",
      """SELECT c.c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val fact = Tables.orders(s, d).select(col("o_custkey"), col("o_totalprice"))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.ops.Ops.saltedJoin(fact, dim, Seq("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("c_mktsegment"))
    },

    // Equal-key band join through the SECOND custom whole-operator
    // (graft.plans.BandJoin): purchases matched to every click of the
    // same user within ±24 hours. The built-in plan (equi-join then
    // band filter) materializes every same-user pair before pruning —
    // quadratic on hot users; the custom exec co-partitions, sorts, and
    // sweeps a sliding window per partition: O(n + matches). Value-equal
    // to the join+filter oracle; comparisons run in exact micros.
    QDef("join_band_custom",
      """SELECT p.event_id AS pid, c.event_id AS cid,
        |  epoch_us(CAST(c.ts AS TIMESTAMP)) - epoch_us(CAST(p.ts AS TIMESTAMP)) AS dt_us
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id AND p.event_type = 'purchase'
        |  AND c.event_type = 'click' AND p.event_id % 5 = 0
        |  AND abs(epoch_us(CAST(c.ts AS TIMESTAMP)) - epoch_us(CAST(p.ts AS TIMESTAMP))) <= 86400000000
        |ORDER BY pid, cid""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase" && col("event_id") % 5 === 0)
        .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id").as("cuser"), col("ts").as("cts"))
      graft.ops.Ops.bandJoin(p, c, Seq("user_id"), Seq("cuser"),
          "pts", "cts", delta = 86400L * 1000 * 1000)
        .select(col("pid"), col("cid"),
          (unix_micros(col("cts")) - unix_micros(col("pts"))).as("dt_us"))
        .orderBy(col("pid"), col("cid"))
    },

    // Degree distribution of the same interaction graph — the profiling
    // pass that sizes every downstream graph job (skew detection: a
    // power-law tail means salting/broadcast decisions). Two aggregations
    // over the symmetrized edge set; no joins.
    QDef("graph_degree_distribution",
      """WITH e0 AS (SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
        |                   's' || CAST(l.l_suppkey AS VARCHAR) AS dst
        |            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src, count(*) AS degree FROM e GROUP BY src)
        |SELECT degree, count(*) AS n_nodes FROM deg
        |GROUP BY degree ORDER BY degree""".stripMargin) { (s, d) =>
      // The graph is BIPARTITE with disjoint node namespaces ("c…" vs
      // "s…"), so symmetrize-then-distinct would shuffle every edge
      // twice for nothing: distinct the forward edges once, then one
      // GROUPING SETS((src),(dst)) pass counts both endpoints' degrees
      // in a single Expand + aggregate — the same answer with half the
      // distinct shuffle volume.
      val e0 = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      e0.distinct()
        .groupingSets(Seq(Seq(col("src")), Seq(col("dst"))), col("src"), col("dst"))
        .agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("degree"))
    },

    // Damped PageRank (5 supersteps) over the customer–supplier
    // interaction graph — the iterative Pregel shape (edge join +
    // dst-keyed aggregation per superstep) that powers influence and
    // link-quality scoring over web-scale corpora. Contributions are
    // 12dp-quantized and summed as DECIMAL, ranks re-rounded each step,
    // so the fixed-point schedule is engine- and partitioning-invariant;
    // the oracle unrolls the same five supersteps as CTEs.
    QDef("graph_pagerank", {
      // floor(x*1e12 + 0.5)/1e12, not round(x, 12): the floor form is
      // all exactly-defined IEEE primitives; decimal round on a double
      // resolves near-tie bits engine-specifically (one boundary hit
      // observed at sf0.1)
      def q12(x: String) = s"floor(($x) * 1e12 + 0.5) / 1e12"
      val iter = (k: Int) =>
        s"""r$k AS (SELECT e.dst AS node,
           |  ${q12(s"""CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE)
           |    * CAST(sum(CAST(${q12("r.rank / deg.outdeg")} AS DECIMAL(28,12))) AS DOUBLE)""")} AS rank
           |FROM e JOIN r${k - 1} r ON e.src = r.node JOIN deg ON deg.src = e.src, nn
           |GROUP BY e.dst, nn.n)""".stripMargin
      s"""WITH e0 AS (SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
         |                   's' || CAST(l.l_suppkey AS VARCHAR) AS dst
         |            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |nn AS (SELECT count(DISTINCT src) AS n FROM e),
         |r0 AS (SELECT s.src AS node, ${q12("CAST(1.0 AS DOUBLE) / nn.n")} AS rank
         |       FROM (SELECT DISTINCT src FROM e) s, nn),
         |${(1 to 5).map(iter).mkString(",\n")}
         |SELECT node, rank FROM r5 ORDER BY node""".stripMargin
    }) { (s, d) =>
      // no pre-distinct: pageRank's symmetrize step dedups anyway, and
      // dropping it saves one full-fact shuffle before the persist
      val edges = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.ext.Graph.pageRank(edges, iters = 5)
        .orderBy(col("node"))
    },

    // Exact triangle count by degree-ordered orientation (Suri-
    // Vassilvitskii / Cohen) over the supplier co-purchase graph
    // (suppliers adjacent when they serve the same order; orders % 10
    // bounds the declared slice). Orientation from the lower-(degree,id)
    // endpoint caps every out-degree at O(sqrt(m)), so the wedge join's
    // output is <= O(m^1.5) REGARDLESS of degree skew — a hub of degree
    // 1M sources zero wedges once oriented away from. Both the wedge
    // join and the closing join are hash-partitionable equi-joins; the
    // 100 TB plan is the same plan.
    QDef("graph_triangle_count",
      """WITH e0 AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        |            FROM lineitem a JOIN lineitem b
        |              ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        |            WHERE a.l_orderkey % 10 = 0),
        |deg AS (SELECT x, count(*) AS d
        |        FROM (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0) GROUP BY x),
        |o AS (SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e0.u < e0.v)
        |                  THEN e0.u ELSE e0.v END AS s,
        |             CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e0.u < e0.v)
        |                  THEN e0.v ELSE e0.u END AS t
        |      FROM e0 JOIN deg d1 ON d1.x = e0.u JOIN deg d2 ON d2.x = e0.v),
        |w AS (SELECT a.s, a.t AS t1, b.t AS t2 FROM o a JOIN o b ON a.s = b.s AND a.t < b.t),
        |tri AS (SELECT w.t1 FROM w JOIN e0 ON e0.u = w.t1 AND e0.v = w.t2)
        |SELECT (SELECT count(*) FROM deg) AS n_vertices,
        |       (SELECT count(*) FROM e0) AS n_edges,
        |       (SELECT count(*) FROM w) AS n_wedges,
        |       (SELECT count(*) FROM tri) AS n_triangles""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey"), col("l_suppkey"))
      val edges = li.alias("a").join(li.alias("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_suppkey") < col("b.l_suppkey"))
        .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
      graft.ext.Graph.triangleCount(edges)
    },

    // Z-order (Morton) clustering — the data-LAYOUT optimization behind
    // multi-dimensional file skipping (Delta/Iceberg OPTIMIZE ZORDER).
    // Interleaving the low 8 bits of two join/filter dimensions gives a
    // 1-D sort key whose ranges are tight bounding boxes in BOTH
    // dimensions, so per-file min/max stats prune 2-D predicates that a
    // single-column sort can only prune on its leading column. The
    // declared query verifies the transform: per 1024-cell z-range the
    // bounding box of (x, y) must be small and the oracle pins every
    // box exactly. ZOrderLayoutSpec demonstrates the payoff end-to-end:
    // the same filter touches ~4× fewer files on a z-sorted layout than
    // on an orderkey-sorted one. Pure integer bit arithmetic — no
    // doubles, codegen'd, exact on any engine.
    QDef("layout_zorder_stats", {
      val zsum = (0 until 8).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})").mkString(" + ")
      s"""WITH t AS (SELECT l_partkey & 255 AS x, l_suppkey & 255 AS y FROM lineitem),
         |z AS (SELECT x, y, $zsum AS z FROM t)
         |SELECT z >> 10 AS zbucket, count(*) AS n,
         |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y,
         |  (max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS bbox_area
         |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin
    }) { (s, d) =>
      val t = Tables.lineitem(s, d).select(
        col("l_partkey").bitwiseAND(lit(255L)).as("x"),
        col("l_suppkey").bitwiseAND(lit(255L)).as("y"))
      val z = t.withColumn("z", graft.ops.Ops.zValue(col("x"), col("y"), bits = 8))
      z.groupBy(shiftright(col("z"), 10).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          ((max(col("x")) - min(col("x")) + lit(1L)) * (max(col("y")) - min(col("y")) + lit(1L))).as("bbox_area"))
        .orderBy(col("zbucket"))
    }
  )
}
