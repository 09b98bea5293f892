package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator Catalyst extension #2: the equal-key BAND join —
  * `l.key = r.key AND l.t − lo <= r.t AND r.t <= l.t + hi` (the
  * symmetric `|l.t − r.t| <= delta` is lo = hi = delta; one-sided
  * windows like "views in the hour before the purchase" set one bound
  * to 0).
  *
  * Built-in plans for this shape either post-filter an equi-join (every
  * (l, r) pair within a key materializes before the band predicate
  * prunes — hot keys go quadratic) or, without the equi-key, broadcast
  * nested loops. This operator co-partitions both sides on the key and
  * sorts each partition by (key, t) — both inserted by the planner via
  * `requiredChildDistribution` / `requiredChildOrdering`, exactly how
  * SortMergeJoin asks for its inputs — then streams ONE sweep per
  * partition with a sliding window of right rows: O(n_l + n_r + matches)
  * time and O(max rows in any delta-window) memory, no quadratic
  * intermediate, spill-free by construction.
  *
  * The time axis must be long-backed (TimestampType micros or LongType);
  * `lo`/`hi` are in those units. Output = left columns ++ right columns,
  * matches emitted in right-time order per left row.
  */
case class BandJoin(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    lo: Long,
    hi: Long,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  require(lo >= 0 && hi >= 0, s"window bounds must be non-negative, got [$lo, $hi]")
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[BandJoin]] into [[BandJoinExec]]; inert on every other node. */
object BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BandJoin(lk, rk, lt, rt, lo, hi, l, r) =>
      BandJoinExec(lk, rk, lt, rt, lo, hi, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class BandJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    lo: Long,
    hi: Long,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  /** Hash co-partition both sides on the key (one Exchange each at most,
    * inserted by EnsureRequirements — same contract as SortMergeJoin). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** In-partition sort by (key, t) on both sides — the planner inserts
    * SortExec where the child ordering doesn't already satisfy it. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  private def checkTimeType(e: Expression, side: String): Unit = e.dataType match {
    case LongType | TimestampType => ()
    case other => throw new IllegalArgumentException(
      s"band join $side time must be long-backed (long/timestamp), got $other")
  }
  checkTimeType(leftTime, "left")
  checkTimeType(rightTime, "right")

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val ltE = leftTime; val rtE = rightTime
    val dLo = lo; val dHi = hi
    val outRows = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (li, ri0) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(ltE), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rtE), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      // Physical operators must emit UnsafeRow (parents like SortExec /
      // the shuffle serializer cast or serialize directly) — project every
      // JoinedRow through a result projection, as SortMergeJoinExec does.
      val resultProj = UnsafeProjection.create(lOut ++ rOut, lOut ++ rOut)
      val ri = ri0.buffered
      // sliding window of right rows for the current key, ascending rt;
      // rows leave from the head once rt < lt - lo (lt only grows
      // within a key) and enter at the tail while rt <= lt + hi
      val window = mutable.ArrayDeque.empty[(Long, InternalRow)]
      var windowKey: InternalRow = null
      val joiner = new JoinedRow
      li.flatMap { lrow =>
        val lkey = lKeyProj(lrow)
        val ltRow = lTimeProj(lrow)
        // SQL equi-join semantics: a NULL in any key column never matches
        // (natural ordering would compare null == null) — same skip as SMJ.
        // A NULL TIME is the same story on the band predicate: both
        // comparisons are UNKNOWN, so the row pairs with nothing —
        // getLong on the null slot would read it as t = 0 and silently
        // band-match everything near zero (r13 review catch).
        if (lkey.anyNull || ltRow.isNullAt(0)) Iterator.empty
        else {
          val lt = ltRow.getLong(0)
          if (windowKey == null || keyOrd.compare(windowKey, lkey) != 0) {
            window.clear()
            windowKey = lkey.copy()
          } else {
            while (window.nonEmpty && window.head._1 < lt - dLo) { window.removeHead(); () }
          }
          var advance = true
          while (advance && ri.hasNext) {
            val rkey = rKeyProj(ri.head)
            val rtRow = rTimeProj(ri.head)
            if (rkey.anyNull || rtRow.isNullAt(0)) { ri.next(); () } // null key/time never joins
            else {
              val cmp = keyOrd.compare(rkey, lkey)
              if (cmp < 0) { ri.next(); () } // behind every remaining left key group
              else if (cmp == 0) {
                val rt = rtRow.getLong(0)
                if (rt <= lt + dHi) {
                  val row = ri.next()
                  // rt < lt - lo can never match this or any later left
                  // row (lt is non-decreasing within the key) — drop it
                  if (rt >= lt - dLo) window.append((rt, row.copy()))
                } else advance = false // future left rows may still want it
              } else advance = false // right iterator is at the next key group
            }
          }
          outRows += window.size
          window.iterator.map { case (_, rrow) => resultProj(joiner(lrow, rrow)) }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)
}
