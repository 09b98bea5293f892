package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Input row for [[UserProfileProcessor]]: the money column arrives as
  * exact integer cents (quantized once, batch-side) so every state
  * update is Long arithmetic — order-insensitive and bit-exact against
  * a relational oracle however Spark orders the rows within a key. */
case class TwsEvent(user_id: Long, event_type: String, cents: Long)

/** The running per-user aggregate held in ValueState. */
case class TwsAgg(n: Long, cents: Long)

/** One emitted row per key per micro-batch: the cumulative profile
  * AFTER folding that batch's arrivals into state. */
case class TwsOut(user_id: Long, cum_n: Long, n_types: Long, sum_cents: Long)

/** ST18 — per-user cumulative profile on the Spark 4 arbitrary-state
  * API v2 (`transformWithState`, SPARK-40434): the successor to
  * `mapGroupsWithState` that the pack's st3/st12 family uses, with
  * NAMED, independently-typed state primitives instead of one opaque
  * state object.
  *
  * Two state variables per user:
  *  - `agg: ValueState[TwsAgg]` — running (count, cents-sum);
  *  - `types: MapState[String, Long]` — per-event-type counts, whose
  *    key-set size is the running distinct-type count. A MapState
  *    update touches ONE map entry in RocksDB; the
  *    `mapGroupsWithState` equivalent rewrites the whole state object
  *    per batch — the API's point at 100 TB state volumes.
  *
  * All updates commute (adds of Longs, per-type increments), so the
  * emitted cumulative is independent of row order within a batch —
  * what makes a live run at any parallelism hash-comparable to the
  * DuckDB oracle. Mirrors the reference's per-entity running ledger
  * semantics (load gate state, load_data/lambda_function.py:40-73)
  * generalized to multi-metric state.
  */
/** Output of [[WarmStartProcessor]]: totals only (the snapshot the
  * state is seeded from carries no per-type breakdown). */
case class TwsTotal(user_id: Long, cum_n: Long, sum_cents: Long)

/** ST19 — `StatefulProcessorWithInitialState`: the v2 API's batch
  * WARM-START surface. State is seeded per key from a batch-computed
  * snapshot (`handleInitialState`, called once per key before any
  * input), then streamed arrivals fold on top — the migration path
  * from a batch-maintained aggregate table to a streaming one WITHOUT
  * reprocessing history, which at 100 TB of history is the only
  * viable cutover. Emits one cumulative row per key per batch; keys
  * present only in the snapshot stay silent (their published batch
  * value still stands). */
class WarmStartProcessor
    extends StatefulProcessorWithInitialState[Long, TwsEvent, TwsTotal, TwsAgg] {
  @transient private var agg: ValueState[TwsAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState[TwsAgg](
      "agg", Encoders.product[TwsAgg], TTLConfig.NONE)

  override def handleInitialState(key: Long, initialState: TwsAgg,
                                  timerValues: TimerValues): Unit =
    agg.update(initialState)

  override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
                               timerValues: TimerValues): Iterator[TwsTotal] = {
    var n = 0L
    var cents = 0L
    rows.foreach { e => n += 1; cents += e.cents }
    val prev = if (agg.exists()) agg.get() else TwsAgg(0L, 0L)
    val cur = TwsAgg(prev.n + n, prev.cents + cents)
    agg.update(cur)
    Iterator.single(TwsTotal(key, cur.n, cur.cents))
  }
}

/** Input row for [[SessionTimerProcessor]]: event time pre-quantized
  * to epoch MILLISECONDS batch-side, so the 30-minute-gap comparisons
  * are integer math stated identically in the oracle (sub-ms jitter
  * can otherwise flip a gap that lands exactly on the boundary). The
  * `ts` timestamp column rides along solely to drive the watermark. */
case class TsEvent(user_id: Long, ts: java.sql.Timestamp, ms: Long)

/** Open-session accumulator: earliest arrival, latest arrival, count. */
case class SessionAcc(start_ms: Long, last_ms: Long, n: Long)

/** A closed session. */
case class SessionOut(user_id: Long, start_ms: Long, n: Long)

/** ST20 — EVENT-TIME TIMERS on the v2 API (`TimeMode.EventTime` +
  * `registerTimer`/`handleExpiredTimer`): inactivity-gap
  * sessionization where the CLOSE is timer-driven. Within a batch,
  * a key's arrivals are sorted and split on the gap; every session
  * but the last is closed inline, and the still-open tail registers
  * a timer at `last_ms + gap`. When the watermark passes it, Spark
  * calls `handleExpiredTimer`, which emits the session and clears
  * state — the pattern session_window (st12) implements internally,
  * here exposed so the emission schedule is programmable (timeout
  * actions, escalations, TTL'd abandonment events). State per key is
  * ONE open session + ONE timer — watermark-bounded, never history.
  * Exactly one timer per key is maintained: a new arrival deletes the
  * old timer before registering the extended one. */
class SessionTimerProcessor(gapMs: Long)
    extends StatefulProcessor[Long, TsEvent, SessionOut] {
  @transient private var open: ValueState[SessionAcc] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[SessionAcc](
      "open", Encoders.product[SessionAcc], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TsEvent],
                               timerValues: TimerValues): Iterator[SessionOut] = {
    val ms = rows.map(_.ms).toArray
    if (ms.isEmpty) return Iterator.empty
    java.util.Arrays.sort(ms)
    val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    var cur = if (open.exists()) {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      open.get()
    } else SessionAcc(ms(0), ms(0) - gapMs, 0L) // seeded so row 0 merges
    ms.foreach { t =>
      if (t - cur.last_ms >= gapMs) {
        if (cur.n > 0) closed += SessionOut(key, cur.start_ms, cur.n)
        cur = SessionAcc(t, t, 1L)
      } else cur = SessionAcc(cur.start_ms, math.max(cur.last_ms, t), cur.n + 1L)
    }
    open.update(cur)
    getHandle.registerTimer(cur.last_ms + gapMs)
    closed.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
    val out = if (open.exists()) {
      val s = open.get()
      Iterator.single(SessionOut(key, s.start_ms, s.n))
    } else Iterator.empty
    open.clear()
    out
  }
}

/** Per-key arrival counter whose ValueState carries a real TTL —
  * the "dormant keys age out" half of the v2 API's 100 TB state
  * story (COVERAGE "arbitrary state v2" rows). TTL is processing-time
  * based (the API's contract, hence TimeMode.ProcessingTime in the
  * test harness), so only the EXPIRED direction is deterministic:
  * a restart after sleeping well past the TTL must see the state
  * gone and restart the count — which is exactly what the test pins. */
class TtlCountProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[Long, TwsEvent, TwsTotal] {
  @transient private var n: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig(ttl))

  override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
                               timerValues: TimerValues): Iterator[TwsTotal] = {
    val prev = if (n.exists()) n.get() else 0L
    var add = 0L
    var cents = 0L
    rows.foreach { e => add += 1; cents += e.cents }
    n.update(prev + add)
    Iterator.single(TwsTotal(key, prev + add, cents))
  }
}

class UserProfileProcessor extends StatefulProcessor[Long, TwsEvent, TwsOut] {
  @transient private var agg: ValueState[TwsAgg] = _
  @transient private var types: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    agg = getHandle.getValueState[TwsAgg](
      "agg", Encoders.product[TwsAgg], TTLConfig.NONE)
    types = getHandle.getMapState[String, Long](
      "types", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
                               timerValues: TimerValues): Iterator[TwsOut] = {
    var n = 0L
    var cents = 0L
    rows.foreach { e =>
      n += 1
      cents += e.cents
      val seen = if (types.containsKey(e.event_type)) types.getValue(e.event_type) else 0L
      types.updateValue(e.event_type, seen + 1L)
    }
    val prev = if (agg.exists()) agg.get() else TwsAgg(0L, 0L)
    val cur = TwsAgg(prev.n + n, prev.cents + cents)
    agg.update(cur)
    Iterator.single(TwsOut(key, cur.n, types.keys().size.toLong, cur.cents))
  }
}
