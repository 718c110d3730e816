package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a WHOLE-OPERATOR extension: logical node → planner
  * strategy → physical exec, registered through the engine session
  * (SURVEY.md §2.6 extension-surface row; the (c) rung of the custom-op
  * ladder, next to the (b)-rung Expressions in functions/).
  *
  * Semantics (pandas merge_asof parity, left-outer):
  *   - backward (default): latest right row with the same key and
  *     `right.ts <= left.ts`; ties on (key, ts) resolve toward the
  *     GREATEST first payload column (the last row in sort order).
  *   - forward: earliest right row with `right.ts >= left.ts`; ties
  *     resolve toward the SMALLEST first payload column (first in order).
  *   - toleranceMicros: optional max |right.ts - left.ts| in the ts
  *     column's native long unit (µs for timestamps); rows whose best
  *     match falls outside it get nulls. Null timestamps never satisfy a
  *     tolerance; without one they sort as -infinity.
  *
  * Reference parity: a callysto agent calls `CTable::get` for the most
  * recent state written at or before each event it processes (reference
  * callysto/src/types/table.rs:79-113); declaratively that per-row lookup
  * IS this operator.
  *
  * Why a custom plan instead of composition: the union+window form works
  * but drags both inputs through one union schema, a full window frame,
  * and a per-payload-column `last()` fill. This exec declares
  * ClusteredDistribution + per-partition (key, ts) ordering and merges the
  * two sorted streams in ONE linear pass holding O(1) state — at 100 TB
  * each side shuffles exactly once on its key (co-partitioned, skew
  * handled by AQE like any shuffle join), and a pre-bucketed right side
  * (the common "huge slowly-changing state" case) shuffles zero times.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    forward: Boolean = false,
    toleranceMicros: Option[Long] = None
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): AsofJoin = copy(left = newLeft, right = newRight)
}

/** Physical as-of join: sorted-merge over co-partitioned children. */
case class AsofJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    forward: Boolean,
    toleranceMicros: Option[Long],
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  /** Both sides hash-clustered on their key → co-partitioned shuffles
    * (EnsureRequirements inserts them; a side already partitioned on the
    * key shuffles zero bytes).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  /** Per-partition (key, ts) sort; the right side adds the first payload
    * column as tie-break so the backward "last wins" / forward "first
    * wins" rules are deterministic under equal timestamps.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil,
    SortOrder(rightKey, Ascending) :: SortOrder(rightTs, Ascending) ::
      SortOrder(payload.head, Ascending) :: Nil
  )

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val payloadAttrs = payload
    val outAttrs = output
    val nPayload = payloadOut.length
    val fwd = forward
    val tol = toleranceMicros
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKeyExpr.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsExpr.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow

      // |right.ts - left.ts| <= tol, with nulls never qualifying
      def withinTol(rTs: InternalRow, lTs: InternalRow): Boolean = tol match {
        case None => true
        case Some(t) =>
          !rTs.isNullAt(0) && !lTs.isNullAt(0) &&
            math.abs(rTs.getLong(0) - lTs.getLong(0)) <= t
      }

      var rRow: InternalRow = null
      var rKey: InternalRow = null
      var rTs: InternalRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next()
          rKey = rKeyProj(rRow).copy()
          rTs = rTsProj(rRow).copy()
        } else rRow = null
      advanceRight()

      if (fwd) {
        // earliest right row at or after each left ts: the cursor only
        // ever PEEKS at its current row (a right row can serve many left
        // rows); rows strictly before the current left ts are dead for
        // every later left row too, so consumption stays monotone.
        lIter.map { l =>
          val lk = lKeyProj(l)
          val lt = lTsProj(l)
          var continue = rRow != null
          while (continue) {
            val c = keyOrd.compare(rKey, lk)
            if (c < 0 || (c == 0 && tsOrd.compare(rTs, lt) < 0)) {
              advanceRight()
              continue = rRow != null
            } else continue = false
          }
          val matched =
            rRow != null && !lk.isNullAt(0) && keyOrd.compare(rKey, lk) == 0 &&
              withinTol(rTs, lt)
          val p = if (matched) payloadProj(rRow) else nullPayload
          resultProj(joined(l, p))
        }
      } else {
        // latest right row at or before each left ts: remember the most
        // recent consumed payload per key (O(1) state).
        var lastPayload: InternalRow = null
        var lastKey: InternalRow = null
        var lastTs: InternalRow = null
        lIter.map { l =>
          val lk = lKeyProj(l)
          val lt = lTsProj(l)
          var continue = rRow != null
          while (continue) {
            val c = keyOrd.compare(rKey, lk)
            if (c < 0 || (c == 0 && tsOrd.compare(rTs, lt) <= 0)) {
              if (c == 0 && !rKey.isNullAt(0)) {
                lastPayload = payloadProj(rRow).copy()
                lastKey = rKey
                lastTs = rTs
              }
              advanceRight()
              continue = rRow != null
            } else continue = false
          }
          val matched =
            !lk.isNullAt(0) && lastKey != null && keyOrd.compare(lastKey, lk) == 0 &&
              withinTol(lastTs, lt)
          val p = if (matched) lastPayload else nullPayload
          resultProj(joined(l, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan
  ): AsofJoinExec = copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] into [[AsofJoinExec]]; injected via
  * `spark.experimental.extraStrategies` (engine session) and
  * `GraftExtensions.injectPlannerStrategy` (spark.sql.extensions path).
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, pay, payOut, fwd, tol) =>
      AsofJoinExec(lk, rk, lt, rt, pay, payOut, fwd, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
