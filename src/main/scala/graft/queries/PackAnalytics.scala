package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Ops
import graft.schemas.Tables

/** Analytical surface beyond the reference's own operators — the window /
  * temporal / reshaping queries the ai_agent SQL endpoint could emit
  * (SURVEY.md §3.3) and a training-pipeline staple each:
  * running windows, lag/lead, gap sessionization, rollup, pivot, as-of
  * join. Window partitions are keyed on user/order ids — hash-partitioned
  * across executors; no global windows anywhere. */
object PackAnalytics {
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  val queries: Seq[QDef] = Seq(

    // Running per-user totals + lag/lead neighbors. Exact-decimal running
    // sum (window aggregation trees associate differently across engines;
    // decimal is order-free).
    QDef("window_running_sum",
      """SELECT event_id, user_id, value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
        |    (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
        |  lead(value) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables.events(s, d).select(col("event_id"), col("user_id"), col("value"),
          sum(dec(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("running"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
        .orderBy(col("event_id"))
    },

    // Gap-based sessionization (30-minute inactivity boundary): the
    // classic new-session flag + running count, both windowed per user.
    QDef("window_sessionize",
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |d AS (SELECT event_id, user_id, ts,
        |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS is_new
        |      FROM e)
        |SELECT event_id, user_id,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |FROM d ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("is_new",
          when(lag(col("ts"), 1).over(w).isNull ||
            (col("ts") - lag(col("ts"), 1).over(w)) > expr("INTERVAL 30 MINUTES"), 1)
            .otherwise(0))
        .select(col("event_id"), col("user_id"),
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long").as("session_id"))
        .orderBy(col("event_id"))
    },

    // ROLLUP subtotals (priority × status hierarchy + grand total).
    QDef("agg_rollup",
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    },

    // Pivot reshaping: per-user event-type counts as columns.
    QDef("pivot_event_types",
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    },

    // As-of join: each purchase picks up the user's latest signup at or
    // before the purchase time (point-in-time feature lookup).
    QDef("asof_join",
      """WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, min(event_id) AS signup_id
        |      FROM events WHERE event_type = 'signup' GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT l.event_id, l.user_id, r.signup_id
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts")).agg(min(col("event_id")).as("signup_id"))
      Ops.asofJoin(purchases, signups, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), col("user_id"), col("signup_id"))
        .orderBy(col("event_id"))
    },

    // Nearest-match as-of (sensor alignment / quote matching): each
    // purchase takes the signup CLOSEST in time in either direction,
    // ties to the backward match. Ops.asofNearest rides both direction
    // carries on ONE key-hash exchange (two in-partition sorts) — no
    // range probe, no self-join. The oracle composes DuckDB's two
    // directional ASOF joins and picks the closer side.
    QDef("asof_join_nearest",
      """WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, min(event_id) AS signup_id
        |      FROM events WHERE event_type = 'signup' GROUP BY user_id, CAST(ts AS TIMESTAMP)),
        |b AS (SELECT l.event_id, l.user_id, l.ts, r.ts AS bts, r.signup_id AS bid
        |      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
        |f AS (SELECT l.event_id, r.ts AS fts, r.signup_id AS fid
        |      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN fts IS NULL OR (bts IS NOT NULL AND epoch_us(b.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(b.ts))
        |       THEN bid ELSE fid END AS signup_id,
        |  CASE WHEN fts IS NULL OR (bts IS NOT NULL AND epoch_us(b.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(b.ts))
        |       THEN (epoch_us(b.ts) - epoch_us(bts)) // 1000
        |       ELSE (epoch_us(fts) - epoch_us(b.ts)) // 1000 END AS dt_ms
        |FROM b JOIN f USING (event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts")).agg(min(col("event_id")).as("signup_id"))
      Ops.asofNearest(purchases, signups, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), col("user_id"), col("signup_id"), col("dt_ms"))
        .orderBy(col("event_id"))
    },

    // Ranking window family: rank / dense_rank / row_number / ntile /
    // percent_rank in one pass. All windows share one partitioning
    // (priority) and one sort — a single Exchange + Sort in the plan.
    // Ties on o_totalprice are broken by o_orderkey so row_number/ntile
    // are deterministic cross-engine.
    QDef("window_rank_family",
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 6) AS prank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          row_number().over(w).cast("long").as("rn"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("prank"))
        .orderBy(col("o_orderkey"))
    },

    // GROUPING SETS: the explicit multi-level aggregate (finer than
    // rollup/cube) — per (priority,status), per priority, and grand total,
    // one shuffle via Expand.
    QDef("agg_grouping_sets",
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderpriority")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    },

    // Exact distribution stats: interpolated quartiles + median per group
    // (Spark `percentile` ≡ DuckDB `quantile_cont`: both interpolate at
    // p*(n-1)). Rounded at 6dp on both sides — the interpolation arithmetic
    // is double and may differ in the last ulp across engines.
    QDef("agg_percentiles",
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS median,
        |  round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
        |  round(avg(o_totalprice), 6) AS mean
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(round(expr("percentile(o_totalprice, 0.25)"), 6).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("median"),
          round(expr("percentile(o_totalprice, 0.75)"), 6).as("p75"),
          round(avg(col("o_totalprice")), 6).as("mean"))
        .orderBy(col("o_orderpriority"))
    },

    // Banded (non-equi range) join: price-band dimension joined on
    // lo <= price < hi. The band table is tiny and literal →
    // BroadcastNestedLoopJoin, the correct physical shape for a small
    // range dimension at any scale.
    QDef("join_range_bands",
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('A', 0.0, 925.0), ('B', 925.0, 950.0), ('C', 950.0, 975.0),
        |  ('D', 975.0, 990.0), ('E', 990.0, 1e18)),
        |j AS (SELECT b.band, p.p_retailprice
        |      FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi)
        |SELECT band, count(*) AS n,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM j GROUP BY band ORDER BY band""".stripMargin) { (s, d) =>
      import s.implicits._
      val bands = Seq(("A", 0.0, 925.0), ("B", 925.0, 950.0), ("C", 950.0, 975.0),
        ("D", 975.0, 990.0), ("E", 990.0, 1e18)).toDF("band", "lo", "hi")
      Tables.part(s, d)
        .join(broadcast(bands),
          col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("p_retailprice"))).cast("double").as("total"))
        .orderBy(col("band"))
    },

    // Set operations in one surface: nations present in both customer and
    // supplier bases (INTERSECT), and customer-only nations (EXCEPT),
    // tagged and unioned. Spark intersect/except = SQL DISTINCT semantics.
    QDef("setop_nations",
      """SELECT 'both' AS tag, * FROM
        |  (SELECT c_nationkey AS nationkey FROM customer
        |   INTERSECT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'cust_only' AS tag, * FROM
        |  (SELECT c_nationkey FROM customer
        |   EXCEPT SELECT s_nationkey FROM supplier)
        |ORDER BY tag, nationkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersect(su).select(lit("both").as("tag"), col("nationkey"))
        .unionByName(c.except(su).select(lit("cust_only").as("tag"), col("nationkey")))
        .orderBy(col("tag"), col("nationkey"))
    },

    // Time-based RANGE frame: trailing 1-hour activity per user (count +
    // exact decimal sum). RANGE frames bound by interval are the sliding-
    // window aggregate that ROWS frames can't express when event spacing
    // varies. One Exchange + Sort per user partition.
    QDef("window_range_frame",
      """WITH e AS (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT event_id, user_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).selectExpr(
          "event_id", "user_id",
          """CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
            |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1h""".stripMargin,
          """CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts
            |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h""".stripMargin)
        .orderBy(col("event_id"))
    },

    // Value-window family: cume_dist + nth_value + last_value (full frame).
    // Same single partitioning/sort as the ranking family.
    QDef("window_value_family",
      """SELECT o_orderkey,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  nth_value(o_orderkey, 2) OVER w AS second_key,
        |  last_value(o_orderkey) OVER w2 AS last_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
        |  w2 AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(col("o_orderkey"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"),
          last(col("o_orderkey")).over(w2).as("last_key"))
        .orderBy(col("o_orderkey"))
    },

    // Equi-width histogram: fixed [0, 500k) domain in 10 buckets, open-top.
    // Pure arithmetic bucketing — a single partial+final aggregate, no
    // sort, no sketch; the profile query every column-stats pass runs.
    QDef("agg_histogram",
      """SELECT CAST(least(9, floor(o_totalprice / 50000)) AS INTEGER) AS bucket,
        |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(least(lit(9), floor(col("o_totalprice") / 50000)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("bucket"))
    },

    // UNPIVOT/melt: wide measure columns → long (entity, measure, value)
    // rows — the inverse of pivot, and the shape feature stores ingest.
    // Spark's unpivot is a zero-shuffle Expand, linear in rows × measures.
    QDef("reshape_unpivot",
      """WITH b AS (SELECT * FROM lineitem WHERE l_orderkey < 100)
        |SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM b
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM b
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM b
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM b
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).filter(col("l_orderkey") < 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
    },

    // Null-safe equi-join (<=> / IS NOT DISTINCT FROM): null keys match
    // each other instead of vanishing — the semantics CDC/merge keys need
    // when nullable business keys are real. Hash-joinable in Spark
    // (EqualNullSafe is a valid equi-join key), unlike an OR-of-IS-NULL
    // formulation which would degrade to a nested loop.
    QDef("j7_join_null_safe",
      """WITH a AS (SELECT event_id, nullif(event_type, 'error') AS k FROM events WHERE event_id < 500),
        |b AS (SELECT nullif(event_type, 'error') AS k, count(*) AS n_type
        |      FROM events GROUP BY 1)
        |SELECT a.event_id, a.k, b.n_type
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val a = e.filter(col("event_id") < 500)
        .select(col("event_id"), nullif(col("event_type"), lit("error")).as("k"))
      val b = e.select(nullif(col("event_type"), lit("error")).as("bk"))
        .groupBy(col("bk")).agg(count(lit(1)).as("n_type"))
      a.join(b, col("k") <=> col("bk"))
        .select(col("event_id"), col("k"), col("n_type"))
        .orderBy(col("event_id"))
    },

    // FULL OUTER join: union of both key spaces with nulls where absent —
    // the reconciliation shape (e.g. comparing two warehouse generations).
    // Here: per-priority order counts vs per-priority lineitem counts
    // through disjoint key filters so both unmatched sides occur.
    QDef("j8_full_outer",
      """WITH o AS (SELECT o_orderpriority AS k, count(*) AS n_orders
        |           FROM orders WHERE o_orderkey % 2 = 0 AND o_orderpriority <> '5-LOW'
        |           GROUP BY 1),
        |l AS (SELECT o.o_orderpriority AS k, count(*) AS n_items
        |      FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
        |      WHERE o.o_orderpriority <> '1-URGENT' GROUP BY 1)
        |SELECT coalesce(o.k, l.k) AS k, o.n_orders, l.n_items
        |FROM o FULL OUTER JOIN l ON o.k = l.k
        |ORDER BY k""".stripMargin) { (s, d) =>
      val ord = Tables.orders(s, d)
      val o = ord.filter(col("o_orderkey") % 2 === 0 && col("o_orderpriority") =!= "5-LOW")
        .groupBy(col("o_orderpriority").as("ok")).agg(count(lit(1)).as("n_orders"))
      val l = Tables.lineitem(s, d)
        .join(ord.filter(col("o_orderpriority") =!= "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("lk")).agg(count(lit(1)).as("n_items"))
      o.join(l, col("ok") === col("lk"), "full_outer")
        .select(coalesce(col("ok"), col("lk")).as("k"), col("n_orders"), col("n_items"))
        .orderBy(col("k"))
    },

    // Batch form of the stream-stream interval join (StreamingOps
    // .intervalJoin): views attributed to each purchase within the
    // trailing hour, per user. Equi-key + two-sided time bound — the
    // exact condition that makes the streaming version's state expirable.
    QDef("j6_join_interval",
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts FROM e WHERE event_type = 'view')
        |SELECT p.event_id, CAST(count(v.ts) AS BIGINT) AS n_views_1h
        |FROM p LEFT JOIN v ON p.user_id = v.user_id
        |  AND v.ts > p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      p.join(v, col("user_id") === col("v_user") &&
          col("v_ts") > col("ts") - expr("INTERVAL 1 HOUR") && col("v_ts") <= col("ts"),
          "left")
        .groupBy(col("event_id")).agg(count(col("v_ts")).as("n_views_1h"))
        .orderBy(col("event_id"))
    },

    // Native session windows: the built-in session_window operator (batch
    // form of the streaming session aggregate). Spark opens a new session
    // when the gap is >= the timeout (half-open [ts, ts+gap) windows), so
    // the oracle's lag-based sessionizer uses >=.
    QDef("window_session_native",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |d AS (SELECT user_id, ts,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts,
        |        sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM d)
        |SELECT user_id, min(ts) AS session_start, CAST(count(*) AS BIGINT) AS n
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start").as("session_start"), col("n"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // Sliding time windows (1h window, 30min slide): every event lands in
    // two overlapping windows — Spark's window() lowers this to a
    // zero-shuffle Expand before one aggregation. Oracle enumerates the
    // two epoch-aligned 30-minute buckets per event explicitly.
    QDef("window_sliding",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |w AS (SELECT user_id, time_bucket(INTERVAL 30 MINUTE, ts, TIMESTAMP '1970-01-01') AS ws FROM e
        |      UNION ALL
        |      SELECT user_id, time_bucket(INTERVAL 30 MINUTE, ts, TIMESTAMP '1970-01-01') - INTERVAL 30 MINUTE FROM e)
        |SELECT user_id, ws AS window_start, CAST(count(*) AS BIGINT) AS n
        |FROM w GROUP BY user_id, ws
        |ORDER BY user_id, window_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("window.start").as("window_start"), col("n"))
        .orderBy(col("user_id"), col("window_start"))
    },

    // Geometric mean through the typed Aggregator (UDAF) API
    // (graft.plans.GeoMeanAgg): decomposable (Σln, n) buffer → partial
    // aggregation preserved; rounded at 6dp (double sum order).
    QDef("agg_geomean_udaf",
      """SELECT o_orderpriority, round(exp(avg(ln(o_totalprice))), 6) AS geomean
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val geo = udaf(graft.plans.GeoMeanAgg, org.apache.spark.sql.Encoders.scalaDouble)
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(round(geo(col("o_totalprice")), 6).as("geomean"))
        .orderBy(col("o_orderpriority"))
    },

    // The typed Dataset API surface (KeyValueGroupedDataset): groupByKey
    // over a case-class-shaped tuple stream, reduceGroups keeping the
    // per-user max-value event — compile-time-typed the whole way, no
    // Row access. Same hash-partition + object-reduce plan shape as
    // mapGroups in graft.streaming; value-equal to the arg_max oracle.
    // Tiebreak on event_id keeps the reduce associative-deterministic.
    QDef("typed_reduce_groups",
      """WITH r AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_id, value FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"))
        .as[(Long, Long, Double)]
        .groupByKey(_._2)
        .reduceGroups { (a, b) =>
          // keep the larger value; equal values keep the smaller event id
          if (a._3 > b._3 || (a._3 == b._3 && a._1 < b._1)) a else b
        }
        .map { case (user, (eid, _, v)) => (user, eid, v) }
        .toDF("user_id", "event_id", "value")
        .orderBy(col("user_id"))
    },

    // Shipping-priority shape (TPC-H Q3): selective dim filter broadcast
    // against the fact join, decimal revenue aggregate, global top-10 via
    // TakeOrderedAndProject. The customer side is the only broadcast; the
    // orders⋈lineitem spine is a shuffled hash join on the natural key —
    // exactly the plan you want when both fact sides are 100 TB-class.
    QDef("q3_shipping_priority",
      """SELECT l.l_orderkey, o.o_orderdate,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l.l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cutoff = lit("1998-06-01").cast("timestamp")
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },

    // Full CUBE lattice over (returnflag, linestatus): all four grouping
    // combinations in one Expand pass — single scan, single shuffle, the
    // complete dashboard pre-aggregation. Complements agg_rollup (hierarchy)
    // and agg_grouping_sets (explicit sets).
    QDef("agg_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // Deterministic mode (most frequent value, smallest-value tie-break):
    // built-in mode() resolves ties arbitrarily in both engines, so the
    // portable form is a two-level aggregate + ranking window — the first
    // GROUP BY collapses the data to |keys|×|values| rows before the
    // window sees it, so the sort is over group counts, never raw rows.
    QDef("agg_mode_deterministic",
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag ORDER BY n DESC, l_quantity) AS rn FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, n AS n_occurrences
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("n").desc, col("l_quantity"))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_quantity")).agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("n").as("n_occurrences"))
        .orderBy(col("l_returnflag"))
    },

    // Bivariate statistics (covariance / stddev / correlation) computed
    // from exact decimal moments: one partial-aggregatable pass collects
    // n, Σx, Σy, Σx², Σy², Σxy as order-free decimals, and the final
    // projection derives the statistics in double over six scalars per
    // group. Built-in corr()/covar_samp() stream doubles in partition
    // order and are not reproducible across engines; the moment form is
    // bit-stable and shuffles six numbers per group instead of re-reading
    // data — the only way to get deterministic second-order stats at scale.
    QDef("agg_corr_stats",
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1), 6) AS covar_samp,
        |  round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)), 6) AS stddev_x,
        |  round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
        |    / (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |     * sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 6) AS corr
        |FROM m ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val qx = dec(col("l_quantity"))
      val px = dec(col("l_extendedprice"))
      def dbl(n: String): Column = col(n).cast("double")
      val n = col("n")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(qx).as("sx"), sum(px).as("sy"),
          sum(qx * qx).as("sxx"), sum(px * px).as("syy"), sum(qx * px).as("sxy"))
        .select(col("l_returnflag"), n,
          round((dbl("sxy") - dbl("sx") * dbl("sy") / n) / (n - lit(1)), 6).as("covar_samp"),
          round(sqrt((dbl("sxx") - dbl("sx") * dbl("sx") / n) / (n - lit(1))), 6).as("stddev_x"),
          round((dbl("sxy") - dbl("sx") * dbl("sy") / n)
            / (sqrt(dbl("sxx") - dbl("sx") * dbl("sx") / n)
             * sqrt(dbl("syy") - dbl("sy") * dbl("sy") / n)), 6).as("corr"))
        .orderBy(col("l_returnflag"))
    },

    // Discrete percentiles (PERCENTILE_DISC): the smallest actual element
    // with cumulative share >= p — returns a real data value, unlike the
    // interpolated agg_percentiles. One ranking window + one aggregate;
    // value-ties share a rank's value, so the result is deterministic.
    QDef("agg_percentile_disc",
      """SELECT o_orderpriority,
        |  round(quantile_disc(o_totalprice, 0.5), 2) AS median_disc,
        |  round(quantile_disc(o_totalprice, 0.9), 2) AS p90_disc
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val byP = Window.partitionBy(col("o_orderpriority"))
      val w = byP.orderBy(col("o_totalprice"))
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(byP))
        .groupBy(col("o_orderpriority"))
        .agg(
          round(max(when(col("rn") === ceil(lit(0.5) * col("cnt")).cast("long"),
            col("o_totalprice"))), 2).as("median_disc"),
          round(max(when(col("rn") === ceil(lit(0.9) * col("cnt")).cast("long"),
            col("o_totalprice"))), 2).as("p90_disc"))
        .orderBy(col("o_orderpriority"))
    },

    // Bag-semantics set ops (EXCEPT ALL / INTERSECT ALL): multiplicity-
    // aware membership — the dedup-aware diff/overlap between two loads.
    // Both lower to joins on all columns with count matching, no distinct
    // collapse; the grouped projection keeps the compare deterministic.
    QDef("setop_all_variants",
      """WITH a AS (SELECT l_returnflag AS f, CAST(l_quantity AS INTEGER) AS q FROM lineitem WHERE l_orderkey < 600),
        |b AS (SELECT l_returnflag, CAST(l_quantity AS INTEGER) FROM lineitem WHERE l_orderkey >= 300 AND l_orderkey < 900)
        |SELECT 'except_all' AS op, f, q, count(*) AS n
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY f, q
        |UNION ALL
        |SELECT 'intersect_all', f, q, count(*)
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY f, q
        |ORDER BY op, f, q""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val a = li.filter(col("l_orderkey") < 600)
        .select(col("l_returnflag").as("f"), col("l_quantity").cast("int").as("q"))
      val b = li.filter(col("l_orderkey") >= 300 && col("l_orderkey") < 900)
        .select(col("l_returnflag").as("f"), col("l_quantity").cast("int").as("q"))
      def grouped(df: org.apache.spark.sql.DataFrame, op: String) =
        df.groupBy(col("f"), col("q")).agg(count(lit(1)).as("n"))
          .select(lit(op).as("op"), col("f"), col("q"), col("n"))
      grouped(a.exceptAll(b), "except_all")
        .unionAll(grouped(a.intersectAll(b), "intersect_all"))
        .orderBy(col("op"), col("f"), col("q"))
    },

    // Boolean aggregation (bool_and/bool_or): per-key predicates folded
    // in one hash aggregate — the cheap form of "does any/every row
    // satisfy X per key" (vs a semi-join or window).
    QDef("agg_bool",
      """SELECT user_id,
        |  bool_or(event_type = 'purchase') AS any_purchase,
        |  bool_and(value > 1.0) AS all_above_one,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(bool_or(col("event_type") === "purchase").as("any_purchase"),
          bool_and(col("value") > 1.0).as("all_above_one"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    },

    // Explicit CROSS JOIN (the last join flavor): the dense categorical
    // spine — every (region, event_type) combination whether observed or
    // not. Both sides are bounded dimensions; the product broadcasts and
    // never shuffles. Unbounded cross joins stay rejected by default
    // (spark.sql.crossJoin intentional-only via explicit crossJoin call).
    QDef("j9_cross_matrix",
      """SELECT r_name, event_type
        |FROM region CROSS JOIN (SELECT DISTINCT event_type FROM events)
        |ORDER BY r_name, event_type""".stripMargin) { (s, d) =>
      Tables.region(s, d).select(col("r_name"))
        .crossJoin(Tables.events(s, d).select(col("event_type")).distinct())
        .orderBy(col("r_name"), col("event_type"))
    },

    // argmax/argmin aggregation: the value of one column at another
    // column's extreme — one hash aggregate, no join-back and no window.
    // Deterministic because the ordering key (event_id) is unique; with
    // non-unique keys use the mode/topKPerKey patterns instead.
    QDef("agg_argmax",
      """SELECT user_id,
        |  arg_max(event_type, event_id) AS last_type,
        |  arg_min(event_type, event_id) AS first_type,
        |  max(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max_by(col("event_type"), col("event_id")).as("last_type"),
          min_by(col("event_type"), col("event_id")).as("first_type"),
          max(col("value")).as("max_value"))
        .orderBy(col("user_id"))
    },

    // Ordered string aggregation (LISTAGG): collect_list is
    // order-nondeterministic under parallelism, so the portable form
    // sorts the collected array before joining — deterministic on any
    // partitioning, equal to the oracle's ORDER BY-qualified string_agg.
    QDef("agg_string_agg",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, count(*) AS n
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"))
    },

    // Deterministic stratified sampling: every 20th row per stratum in a
    // stable order. Content-deterministic like the md5 split (same sample
    // on every engine/run), uniform within each stratum by construction.
    QDef("sample_stratified",
      """WITH r AS (SELECT event_id, event_type,
        |             row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
        |           FROM events)
        |SELECT event_id, event_type, rn FROM r WHERE rn % 20 = 1
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // per-stratum ordinal = chunked cumsum of ones over the unique
      // monotone event id (Ops.chunkedCumsum) — a per-type window would
      // serialize each stratum onto one task at any corpus size
      graft.ops.Ops.chunkedCumsum(
          Tables.events(s, d)
            .select(col("event_id"), col("event_type")).withColumn("one", lit(1L)),
          "event_type", "event_id", "one", "rn")
        .filter(col("rn") % 20 === 1)
        .select(col("event_id"), col("event_type"), col("rn"))
        .orderBy(col("event_id"))
    },

    // Funnel conversion (view → click → purchase, strictly ordered per
    // user): each stage is a per-user min-timestamp aggregate joined back
    // on user_id — co-partitioned equi-joins whose inputs shrink at every
    // stage, never a window over the raw stream. The product-analytics
    // staple every event warehouse runs.
    QDef("funnel_conversion",
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click,
        |       (SELECT count(*) FROM p) AS n_purchase""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    },

    // Islands-and-gaps interval merge: every event opens a 5-minute
    // activity window; overlapping/adjacent windows coalesce into islands
    // per user (the classic "merge overlapping intervals" pass behind
    // uptime, billing and session-coverage reports). The island boundary
    // is ts > running max of prior interval ends — one exchange per user
    // partition, three window functions, no self-join. Durations stay in
    // exact integer microseconds.
    QDef("window_islands",
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS s,
        |             CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS f FROM events),
        |m AS (SELECT user_id, event_id, s, f,
        |        max(f) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |      FROM e),
        |g AS (SELECT user_id, s, f,
        |        sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY user_id ORDER BY s, event_id
        |                ROWS UNBOUNDED PRECEDING) AS island
        |      FROM m),
        |i AS (SELECT user_id, island, min(s) AS st, max(f) AS fin
        |      FROM g GROUP BY user_id, island)
        |SELECT user_id, count(*) AS n_islands,
        |       CAST(sum(epoch_us(fin) - epoch_us(st)) AS BIGINT) AS covered_us
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts").as("s"),
          (col("ts") + expr("INTERVAL 5 MINUTES")).as("f"))
        .withColumn("pm",
          max(col("f")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("island",
          sum(when(col("pm").isNull || col("s") > col("pm"), 1).otherwise(0))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("s")).as("st"), max(col("f")).as("fin"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(unix_micros(col("fin")) - unix_micros(col("st"))).as("covered_us"))
        .orderBy(col("user_id"))
    },

    // SCD type-2 compression: collapse an append-only event log into
    // validity intervals per user — keep only rows where the tracked
    // attribute changes, then lead() supplies valid_to (NULL = current).
    // One exchange, two window passes over it; the standard CDC-to-
    // dimension build.
    QDef("scd2_intervals",
      """WITH e AS (SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |d AS (SELECT user_id, event_type, ts, event_id,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
        |      FROM e),
        |ch AS (SELECT user_id, event_type, ts, event_id FROM d
        |       WHERE prev_t IS NULL OR prev_t <> event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |FROM ch ORDER BY user_id, valid_from""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev_t", lag(col("event_type"), 1).over(w))
        .filter(col("prev_t").isNull || col("prev_t") =!= col("event_type"))
        .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
          lead(col("ts"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))
            .as("valid_to"))
        .orderBy(col("user_id"), col("valid_from"))
    },

    // Markov transition counts over the per-user event sequence: lead()
    // pairs each event with its successor, then a corpus-wide bigram
    // count — the sequence-model / next-event-prediction feature build.
    // One exchange for the window, partial+final agg for the count.
    QDef("event_transition_matrix",
      """WITH e AS (SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |d AS (SELECT event_type,
        |        lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |      FROM e)
        |SELECT event_type, next_type, count(*) AS n FROM d
        |WHERE next_type IS NOT NULL
        |GROUP BY event_type, next_type ORDER BY event_type, next_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_type"), lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("next_type"))
    },

    // Cohort retention: users grouped by first-activity week, counted in
    // every subsequent week they return. Two shrinking aggregates joined
    // on user_id — the cohort table never sees the raw event stream
    // twice, and the week arithmetic is integer-exact in both engines.
    QDef("cohort_retention",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |      FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM e)
        |SELECT f.cohort, CAST(date_diff('day', f.cohort, a.wk) // 7 AS INTEGER) AS week_offset,
        |       count(*) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY f.cohort, week_offset ORDER BY f.cohort, week_offset""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("user_id"), col("ts"))
      val first = e.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort"))
      val active = e.select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk")).distinct()
      active.join(first, Seq("user_id"))
        .groupBy(col("cohort"),
          (datediff(col("wk"), col("cohort")).cast("long") / 7)
            .cast("int").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort"), col("week_offset"))
    },

    // Median absolute deviation per group — the robust dispersion measure
    // quality pipelines prefer over stddev. Two exact interpolated
    // medians chained through a broadcast of the per-group first medians;
    // both engines interpolate identically (≡ quantile_cont precedent
    // from agg_percentiles).
    QDef("agg_mad",
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |           FROM events GROUP BY event_type)
        |SELECT e.event_type, round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
        |FROM events e JOIN m ON e.event_type = m.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val m = e.groupBy(col("event_type"))
        .agg(percentile(col("value"), lit(0.5)).as("med"))
      e.join(broadcast(m), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(round(percentile(abs(col("value") - col("med")), lit(0.5)), 6).as("mad"))
        .orderBy(col("event_type"))
    },

    // Cumulative distinct count per user over time ("how many event types
    // has this user touched so far"): first-occurrence flags from a
    // (user, type) ranking window, running-summed over the user timeline.
    // Exact without any distinct-in-window support; two exchanges total.
    QDef("window_cum_distinct",
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT event_id, user_id, ts,
        |        CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |                                     ORDER BY ts, event_id) = 1
        |             THEN 1 ELSE 0 END AS first_seen
        |      FROM e)
        |SELECT event_id, user_id,
        |  CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS types_so_far
        |FROM f ORDER BY event_id""".stripMargin) { (s, d) =>
      val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val wCum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .withColumn("first_seen",
          when(row_number().over(wFirst) === 1, 1).otherwise(0))
        .select(col("event_id"), col("user_id"),
          sum(col("first_seen")).over(wCum).cast("long").as("types_so_far"))
        .orderBy(col("event_id"))
    },

    // Quantity-weighted average price per return flag — the weighted mean
    // as one decimal-exact aggregate pass (single decimal multiply per
    // row, division only in the final projection).
    QDef("agg_weighted_avg",
      """SELECT l_returnflag,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |        / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val dec2 = (c: Column) => c.cast(DecimalType(18, 2))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(
          sum(dec2(col("l_extendedprice")) * dec2(col("l_quantity"))).cast("double")
            / sum(dec2(col("l_quantity"))).cast("double"), 6).as("wavg_price"))
        .orderBy(col("l_returnflag"))
    },

    // Z-score outlier counts per group from exact decimal moments (the
    // agg_corr_stats recipe: decimal sums are order-free, the double
    // formula over them is engine-invariant). One moment pass + one
    // broadcast-joined flag pass — no window, no sort, linear at any
    // scale.
    QDef("stats_zscore_outliers",
      """WITH s AS (SELECT event_type,
        |             CAST(count(*) AS DOUBLE) AS n,
        |             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
        |             CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS svv
        |           FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n_events,
        |       CAST(sum(CASE WHEN abs(e.value - s.sv / s.n) >
        |                          2 * sqrt(s.svv / s.n - (s.sv / s.n) * (s.sv / s.n))
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN s ON e.event_type = s.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val dec = (c: Column) => c.cast(DecimalType(18, 2))
      val e = Tables.events(s, d)
      val stats = e.groupBy(col("event_type")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("value"))).cast("double").as("sv"),
        sum(dec(col("value")) * dec(col("value"))).cast("double").as("svv"))
      val mean = col("sv") / col("n")
      val sd = sqrt(col("svv") / col("n") - mean * mean)
      e.join(broadcast(stats), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(abs(col("value") - mean) > lit(2) * sd, 1).otherwise(0))
            .cast("long").as("n_outliers"))
        .orderBy(col("event_type"))
    },

    // Per-user EWMA (α = 0.5) over the time-ordered value stream — the
    // order-SENSITIVE per-key fold (smoothing, decay, compounding) that
    // plain aggregates can't express. Each user's events collapse to one
    // sorted in-memory array (bounded by per-key history, not table
    // size), then a sequential left fold seeded with the first value —
    // the identical fold DuckDB's list_reduce runs, so the doubles are
    // bit-exact with α = 0.5 (exact halving). One exchange, no window
    // sort of the full table.
    QDef("window_ewma",
      """SELECT user_id, count(*) AS n,
        |  list_reduce(list(value ORDER BY ts, event_id),
        |              (a, b) -> 0.5 * a + 0.5 * b) AS ewma
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("value")))).as("seq"))
        .select(col("user_id"), size(col("seq")).cast("long").as("n"),
          aggregate(
            expr("slice(seq, 2, size(seq) - 1)"),
            element_at(col("seq"), 1).getField("value"),
            (acc, x) => lit(0.5) * acc + lit(0.5) * x.getField("value")).as("ewma"))
        .orderBy(col("user_id"))
    },

    // Bounded trailing ROWS frame (rolling min/max over the last 7
    // events): the frame type the RANGE-interval and unbounded-running
    // windows don't cover — selection-only aggregates, so doubles are
    // exact regardless of frame evaluation order.
    QDef("window_rolling_minmax",
      """SELECT event_id, user_id,
        |  min(value) OVER w AS roll_min, max(value) OVER w AS roll_max,
        |  count(*) OVER w AS n_in_frame
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          min(col("value")).over(w).as("roll_min"),
          max(col("value")).over(w).as("roll_max"),
          count(lit(1)).over(w).as("n_in_frame"))
        .orderBy(col("event_id"))
    },

    // 2-D histogram (the heatmap/feature-binning surface): quantity ×
    // price quantized to integer cells in one aggregation — floor over a
    // double division is exact IEEE, so cell assignment is
    // engine-invariant. Sparse output (only occupied cells), the layout
    // that scales to any grid.
    QDef("agg_histogram_2d",
      """SELECT CAST(floor(l_quantity / 10) AS INTEGER) AS qx,
        |  CAST(floor(l_extendedprice / 20000) AS INTEGER) AS py,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY qx, py""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_quantity") / 10).cast("int").as("qx"),
          floor(col("l_extendedprice") / 20000).cast("int").as("py"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("qx"), col("py"))
    },

    // Inter-arrival statistics per user (the monitoring/engagement
    // signal): consecutive event gaps via lag over the time-ordered
    // stream, aggregated as exact integer milliseconds — gap sums are
    // longs, so no float-order concerns anywhere.
    QDef("ts_interarrival_stats",
      """WITH g AS (SELECT user_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) -
        |      lag(epoch_ms(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
        |  FROM events)
        |SELECT user_id, count(gap_ms) AS n_gaps,
        |  CAST(max(gap_ms) AS BIGINT) AS max_gap_ms,
        |  round(CAST(sum(gap_ms) AS DOUBLE) / count(gap_ms), 6) AS mean_gap_ms
        |FROM g WHERE gap_ms IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"),
          (unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w)).as("gap_ms"))
        .filter(col("gap_ms").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(col("gap_ms")).as("n_gaps"),
          max(col("gap_ms")).cast("long").as("max_gap_ms"),
          round(sum(col("gap_ms")).cast("double") / count(col("gap_ms")), 6)
            .as("mean_gap_ms"))
        .orderBy(col("user_id"))
    },

    // Last-touch attribution (the marketing-analytics staple): every
    // purchase credits the latest preceding click of the same user (the
    // as-of join), and attributed revenue rolls up per click with
    // decimal sums. Purchases with no preceding click land in the NULL
    // touch group — dropped silently by naive inner-join attributions.
    QDef("attribution_last_touch",
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, min(event_id) AS click_id
        |      FROM events WHERE event_type = 'click' GROUP BY user_id, CAST(ts AS TIMESTAMP)),
        |a AS (SELECT p.user_id, p.value, c.click_id
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts)
        |SELECT user_id, click_id, count(*) AS n_purchases,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed
        |FROM a GROUP BY user_id, click_id
        |ORDER BY user_id, click_id NULLS FIRST""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts")).agg(min(col("event_id")).as("click_id"))
      Ops.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts")
        .groupBy(col("user_id"), col("click_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("attributed"))
        .orderBy(col("user_id"), col("click_id").asc_nulls_first)
    },

    // Path analysis (user journeys): the most common 3-step event-type
    // sequences across users — each user's time-ordered stream collapses
    // to one array (bounded by per-user history), trigram windows slide
    // with the zip_with-shift trick, and global counts rank the paths.
    // The product-analytics complement of the pairwise transition matrix.
    QDef("path_top_trigrams",
      """WITH seqs AS (SELECT user_id, list(event_type ORDER BY ts, event_id) AS l
        |              FROM events GROUP BY user_id),
        |paths AS (SELECT unnest(list_transform(range(1, length(l)-1),
        |            i -> l[i] || '->' || l[i+1] || '->' || l[i+2])) AS path
        |          FROM seqs)
        |SELECT path, count(*) AS n FROM paths
        |GROUP BY path ORDER BY n DESC, path LIMIT 15""".stripMargin) { (s, d) =>
      val l = col("l")
      val m = greatest(size(l) - 2, lit(0))
      val tri = zip_with(
        zip_with(slice(l, lit(1), m), slice(l, lit(2), m),
          (a, b) => concat(a, lit("->"), b)),
        slice(l, lit(3), m), (ab, c) => concat(ab, lit("->"), c))
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))).as("s"))
        .select(transform(col("s"), x => x.getField("event_type")).as("l"))
        .select(explode(tri).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(15)
    },

    // Year-over-year growth (the BI staple): monthly revenue, each month
    // compared to the same month a year earlier via lag(12) over the
    // month-ordered series. The window partitions by nothing but holds
    // only |months| aggregated rows — the heavy lifting happened in the
    // partial+final hash aggregate below it.
    QDef("ts_yoy_growth",
      """WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT CAST(month AS DATE) AS month, round(rev, 2) AS rev,
        |  round(lag(rev, 12) OVER (ORDER BY month), 2) AS rev_prior_year,
        |  round(rev / lag(rev, 12) OVER (ORDER BY month) - 1, 6) AS yoy
        |FROM m ORDER BY month""".stripMargin) { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(sum(dec(col("o_totalprice"))).cast("double").as("rev"))
      val w = Window.orderBy(col("month"))
      m.select(col("month").cast("date").as("month"), round(col("rev"), 2).as("rev"),
          round(lag(col("rev"), 12).over(w), 2).as("rev_prior_year"),
          round(col("rev") / lag(col("rev"), 12).over(w) - 1, 6).as("yoy"))
        .orderBy(col("month"))
    },

    // Share-of-total within a hierarchy (percent-of-parent): each
    // nation's revenue as a share of its region — the aggregate
    // broadcast-joins its per-region total; no second scan, no window
    // over raw rows.
    QDef("window_share_of_total",
      """WITH n AS (SELECT r.r_name, na.n_name,
        |    sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revd
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation na ON c.c_nationkey = na.n_nationkey
        |  JOIN region r ON na.n_regionkey = r.r_regionkey
        |  GROUP BY r.r_name, na.n_name)
        |SELECT r_name, n_name, round(CAST(revd AS DOUBLE), 2) AS rev,
        |  round(CAST(revd AS DOUBLE)
        |    / CAST(sum(revd) OVER (PARTITION BY r_name) AS DOUBLE), 6) AS share
        |FROM n ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      // the window total sums DECIMALS, not doubles: window iteration
      // order differs between engines, and a float sum would drift by
      // an ulp at the rounding boundary
      val n = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("o_totalprice"))).as("revd"))
      n.select(col("r_name"), col("n_name"),
          round(col("revd").cast("double"), 2).as("rev"),
          round(col("revd").cast("double")
            / sum(col("revd")).over(Window.partitionBy(col("r_name"))).cast("double"), 6)
            .as("share"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Winsorized mean per group (robust to heavy tails): clamp values to
    // the group's discrete p05/p95 — actual data values, so the clamp
    // boundaries are exact on both engines — then a decimal-sum mean.
    // One window pass for the quantile positions, a broadcast of
    // |groups| bounds, one aggregation; no sort of the full table
    // beyond the quantile window.
    QDef("stats_winsorized_mean",
      """WITH p AS (SELECT event_type,
        |             quantile_disc(value, 0.05) AS lo, quantile_disc(value, 0.95) AS hi
        |           FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n, p.lo, p.hi,
        |  round(CAST(sum(CAST(greatest(p.lo, least(p.hi, e.value)) AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*), 6) AS winsorized_mean
        |FROM events e JOIN p USING (event_type)
        |GROUP BY e.event_type, p.lo, p.hi ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val byT = Window.partitionBy(col("event_type"))
      val w = byT.orderBy(col("value"), col("event_id"))
      val p = e
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(byT))
        .groupBy(col("event_type"))
        .agg(
          max(when(col("rn") === ceil(lit(0.05) * col("cnt")).cast("long"),
            col("value"))).as("lo"),
          max(when(col("rn") === ceil(lit(0.95) * col("cnt")).cast("long"),
            col("value"))).as("hi"))
      e.join(broadcast(p), Seq("event_type"))
        .groupBy(col("event_type"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n"),
          round(sum(greatest(col("lo"), least(col("hi"), col("value")))
            .cast(DecimalType(18, 2))).cast("double") / count(lit(1)), 6)
            .as("winsorized_mean"))
        .select(col("event_type"), col("n"), col("lo"), col("hi"),
          col("winsorized_mean"))
        .orderBy(col("event_type"))
    },

    // Population skewness / excess kurtosis per group from exact decimal
    // moments S1..S4 (the corr/linreg recipe extended to 3rd/4th
    // moments). Tight DECIMAL(7,2) input keeps every chained product
    // under 38 digits — NO precision capping, so the raw moments are
    // exact and order-free in any engine; the central-moment formula
    // then runs in doubles with sqrt instead of pow(x,1.5) (IEEE sqrt is
    // correctly rounded, libm pow is not). Built-in skewness()/kurtosis()
    // stream doubles and are not reproducible cross-engine.
    QDef("agg_skew_kurtosis",
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(7,2))) AS s1,
        |    sum(CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2))) AS s2,
        |    sum(CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2))) AS s3,
        |    sum(CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2))) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (SELECT l_returnflag, n,
        |    CAST(s1 AS DOUBLE) / n AS mu, CAST(s2 AS DOUBLE) / n AS r2,
        |    CAST(s3 AS DOUBLE) / n AS r3, CAST(s4 AS DOUBLE) / n AS r4 FROM m)
        |SELECT l_returnflag, n,
        |  round(mu, 6) AS mean,
        |  round((r3 - 3 * mu * r2 + 2 * mu * mu * mu)
        |    / ((r2 - mu * mu) * sqrt(r2 - mu * mu)), 6) AS skewness,
        |  round((r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu)
        |    / ((r2 - mu * mu) * (r2 - mu * mu)) - 3, 6) AS kurtosis_excess
        |FROM d ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val q7 = col("l_quantity").cast(DecimalType(7, 2))
      val n = col("n")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(q7).as("s1"), sum(q7 * q7).as("s2"),
          sum(q7 * q7 * q7).as("s3"), sum(q7 * q7 * q7 * q7).as("s4"))
        .select(col("l_returnflag"), n,
          (col("s1").cast("double") / n).as("mu"),
          (col("s2").cast("double") / n).as("r2"),
          (col("s3").cast("double") / n).as("r3"),
          (col("s4").cast("double") / n).as("r4"))
        .select(col("l_returnflag"), n,
          round(col("mu"), 6).as("mean"),
          round((col("r3") - lit(3) * col("mu") * col("r2")
              + lit(2) * col("mu") * col("mu") * col("mu"))
            / ((col("r2") - col("mu") * col("mu"))
              * sqrt(col("r2") - col("mu") * col("mu"))), 6).as("skewness"),
          round((col("r4") - lit(4) * col("mu") * col("r3")
              + lit(6) * col("mu") * col("mu") * col("r2")
              - lit(3) * col("mu") * col("mu") * col("mu") * col("mu"))
            / ((col("r2") - col("mu") * col("mu"))
              * (col("r2") - col("mu") * col("mu"))) - lit(3), 6).as("kurtosis_excess"))
        .orderBy(col("l_returnflag"))
    },

    // Per-group least-squares regression (price ~ quantity) from exact
    // decimal moments — slope/intercept/r² computed by the same
    // order-free-moments-then-double-formula recipe as agg_corr_stats.
    // One aggregation pass; no per-row residual shuffle. Built-in
    // regr_slope streams doubles and is not reproducible cross-engine.
    QDef("agg_linreg",
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
        |  round((CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
        |FROM m ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val qx = dec(col("l_quantity"))
      val px = dec(col("l_extendedprice"))
      def dbl(c: String): Column = col(c).cast("double")
      val n = col("n")
      val covN = n * dbl("sxy") - dbl("sx") * dbl("sy")
      val varXN = n * dbl("sxx") - dbl("sx") * dbl("sx")
      val varYN = n * dbl("syy") - dbl("sy") * dbl("sy")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(qx).as("sx"), sum(px).as("sy"),
          sum(qx * qx).as("sxx"), sum(px * px).as("syy"), sum(qx * px).as("sxy"))
        .select(col("l_returnflag"), n,
          round(covN / varXN, 6).as("slope"),
          round((dbl("sy") - covN / varXN * dbl("sx")) / n, 6).as("intercept"),
          round(covN * covN / (varXN * varYN), 6).as("r2"))
        .orderBy(col("l_returnflag"))
    },

    // Population Stability Index — the standard data-drift monitor a
    // production pipeline runs between a reference and a current
    // population (here: even vs odd user cohorts, value histogrammed
    // into ten width-10 buckets clamped to [0,90+]). The full 10-bucket
    // scaffold matters: with Laplace-smoothed proportions an empty
    // bucket still contributes (the two cohorts' totals differ), so a
    // sparse-only group-by would drop real PSI mass. Counts shuffle
    // once by (event_type, cohort, bucket); the scaffold is a broadcast
    // cross of event_types × 10. All-double PSI terms share the oracle's
    // expression shape, then 1e12-quantized DECIMAL sums (order-free).
    QDef("dq_drift_psi",
      """WITH b AS (SELECT event_type, user_id % 2 AS cohort,
        |             least(greatest(CAST(floor(value / 10) AS BIGINT), 0), 9) AS bucket
        |           FROM events),
        |c AS (SELECT event_type, cohort, bucket, count(*) AS cnt
        |      FROM b GROUP BY 1, 2, 3),
        |tot AS (SELECT event_type, cohort, sum(cnt) AS tot FROM c GROUP BY 1, 2),
        |scaffold AS (SELECT DISTINCT e.event_type, s.bucket
        |             FROM (SELECT DISTINCT event_type FROM events) e,
        |                  (SELECT unnest(range(10)) AS bucket) s),
        |p AS (SELECT s.event_type, s.bucket,
        |        (COALESCE(r.cnt, 0) + 1.0) / (rt.tot + 10.0) AS pr,
        |        (COALESCE(u.cnt, 0) + 1.0) / (ut.tot + 10.0) AS pc
        |      FROM scaffold s
        |      LEFT JOIN c r ON r.event_type = s.event_type AND r.bucket = s.bucket AND r.cohort = 0
        |      LEFT JOIN c u ON u.event_type = s.event_type AND u.bucket = s.bucket AND u.cohort = 1
        |      JOIN tot rt ON rt.event_type = s.event_type AND rt.cohort = 0
        |      JOIN tot ut ON ut.event_type = s.event_type AND ut.cohort = 1)
        |SELECT event_type,
        |  round(CAST(sum(CAST(floor((pr - pc) * ln(pr / pc) * 1e12 + 0.5) / 1e12
        |                      AS DECIMAL(28,12))) AS DOUBLE), 6) AS psi
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val D12 = DecimalType(28, 12)
      val e = Tables.events(s, d)
      val b = e.select(col("event_type"), (col("user_id") % 2).as("cohort"),
        least(greatest(floor(col("value") / 10).cast("long"), lit(0L)), lit(9L)).as("bucket"))
      val c = b.groupBy(col("event_type"), col("cohort"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val cp = graft.ext.BoundedCache.persist("pack.dq_drift_psi.counts", c)
      val tot = cp.groupBy(col("event_type"), col("cohort")).agg(sum(col("cnt")).as("tot"))
      val scaffold = e.select(col("event_type")).distinct()
        .crossJoin(spark_range_buckets(s))
      def side(coh: Int, cntN: String, totN: String) = (
        cp.filter(col("cohort") === coh).select(col("event_type"), col("bucket"), col("cnt").as(cntN)),
        tot.filter(col("cohort") === coh).select(col("event_type"), col("tot").as(totN)))
      val (r0, t0) = side(0, "rcnt", "rtot")
      val (c1, t1) = side(1, "ccnt", "ctot")
      val p = scaffold
        .join(broadcast(r0), Seq("event_type", "bucket"), "left")
        .join(broadcast(c1), Seq("event_type", "bucket"), "left")
        .join(broadcast(t0), Seq("event_type"))
        .join(broadcast(t1), Seq("event_type"))
        .select(col("event_type"), col("bucket"),
          ((coalesce(col("rcnt"), lit(0L)) + lit(1.0)) / (col("rtot") + lit(10.0))).as("pr"),
          ((coalesce(col("ccnt"), lit(0L)) + lit(1.0)) / (col("ctot") + lit(10.0))).as("pc"))
      p.groupBy(col("event_type"))
        .agg(round(sum((floor((col("pr") - col("pc")) * log(col("pr") / col("pc")) * lit(1e12) + lit(0.5)) / lit(1e12))
          .cast(D12)).cast("double"), 6).as("psi"))
        .orderBy(col("event_type"))
    },

    // Welch's unequal-variance t-test between the same two cohorts the
    // PSI monitor compares — the OTHER standard drift check (mean shift
    // rather than shape shift), plus the Welch–Satterthwaite effective
    // degrees of freedom. Everything derives from four exact DECIMAL
    // sums per (event_type, cohort) — count, Σv, Σv² — in ONE partial+
    // final aggregate pass; the t/df arithmetic is all-double with the
    // oracle's expression shape, so the result is bit-stable on any
    // partitioning (NOTES exactness rule 1).
    QDef("stats_ttest_welch",
      """WITH m AS (SELECT event_type, user_id % 2 AS cohort,
        |             CAST(count(*) AS DOUBLE) AS n,
        |             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
        |             CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS svv
        |           FROM events GROUP BY 1, 2),
        |w AS (SELECT r.event_type,
        |        CAST(r.n AS BIGINT) AS n_ref, CAST(c.n AS BIGINT) AS n_cur,
        |        (r.sv / r.n) - (c.sv / c.n) AS dmean,
        |        ((r.svv - r.sv / r.n * r.sv) / (r.n - 1)) / r.n AS vr,
        |        ((c.svv - c.sv / c.n * c.sv) / (c.n - 1)) / c.n AS vc
        |      FROM m r JOIN m c ON r.event_type = c.event_type
        |      WHERE r.cohort = 0 AND c.cohort = 1)
        |SELECT event_type, n_ref, n_cur,
        |  round(dmean / sqrt(vr + vc), 6) AS t_stat,
        |  round((vr + vc) * (vr + vc) / (vr * vr / (n_ref - 1) + vc * vc / (n_cur - 1)), 6) AS df_welch
        |FROM w ORDER BY event_type""".stripMargin) { (s, d) =>
      val m = Tables.events(s, d)
        .groupBy(col("event_type"), (col("user_id") % 2).as("cohort"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(dec(col("value"))).cast("double").as("sv"),
          sum(dec(col("value")) * dec(col("value"))).cast("double").as("svv"))
      val r = m.filter(col("cohort") === 0)
        .select(col("event_type"), col("n").as("rn"), col("sv").as("rsv"), col("svv").as("rsvv"))
      val c = m.filter(col("cohort") === 1)
        .select(col("event_type"), col("n").as("cn"), col("sv").as("csv"), col("svv").as("csvv"))
      val vr = ((col("rsvv") - col("rsv") / col("rn") * col("rsv")) / (col("rn") - lit(1))) / col("rn")
      val vc = ((col("csvv") - col("csv") / col("cn") * col("csv")) / (col("cn") - lit(1))) / col("cn")
      r.join(broadcast(c), Seq("event_type"))
        .select(col("event_type"),
          col("rn").cast("long").as("n_ref"), col("cn").cast("long").as("n_cur"),
          round((col("rsv") / col("rn") - col("csv") / col("cn")) / sqrt(vr + vc), 6).as("t_stat"),
          round((vr + vc) * (vr + vc) / (vr * vr / (col("rn") - lit(1)) + vc * vc / (col("cn") - lit(1))), 6).as("df_welch"))
        .orderBy(col("event_type"))
    }
  )

  /** Ten-bucket scaffold frame (bucket 0..9) for the PSI histogram. */
  private def spark_range_buckets(s: SparkSession) =
    s.range(0, 10).select(col("id").as("bucket"))
}
