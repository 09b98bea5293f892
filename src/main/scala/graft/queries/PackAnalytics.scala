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
    }
  )
}
