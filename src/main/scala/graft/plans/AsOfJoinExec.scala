package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical backward as-of join: a sort-merge scan over co-partitioned,
  * co-sorted children — the plan shape a native engine gives this operator.
  *
  * Distribution/ordering contract (EnsureRequirements supplies the
  * exchanges and sorts, exactly as for SortMergeJoinExec):
  *   - both children hash-clustered on their key columns (co-partitioned —
  *     the two ClusteredDistributions are reconciled by the planner's
  *     shuffle-spec compatibility machinery);
  *   - each partition sorted by (keys…, ts).
  *
  * The merge then streams BOTH sides exactly once per partition: for each
  * left row in (keys, ts) order, the right cursor advances while
  * (rKey, rTs) <= (lKey, lTs), remembering the payload of the last
  * same-key row it passed — that row IS the as-of match (latest right at or
  * before the probe ts). O(|L| + |R|) per partition, zero row
  * amplification, no per-group buffering of either side — vs the window
  * encoding, this drops the union glue and the running-last frame
  * materialization. At 100 TB: one shuffle of each side, then a pure
  * streaming pass.
  *
  * The held match is one copied UnsafeRow (key) + one copied payload row —
  * constant memory regardless of group size. Output rows are JoinedRow
  * views (downstream operators copy if they buffer, the standard join-exec
  * contract).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    direction: AsOfDirection,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // every output row is a left row (left-outer, no amplification) — left's
  // partitioning and sort order survive verbatim
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val numPay = payload.length
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val payAttrs = payload

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKey = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTs = UnsafeProjection.create(Seq(lTsExpr), leftOut)
      val rTs = UnsafeProjection.create(Seq(rTsExpr), rightOut)
      val rPay = UnsafeProjection.create(payAttrs, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullPay = new GenericInternalRow(numPay)
      val joined = new JoinedRow
      val forward = direction == AsOfForward
      val nearest = direction == AsOfNearest
      // nearest's distance reads the 1-field ts rows as longs (plan
      // construction restricts the type to timestamp/integral)
      val tsLong: InternalRow => Long = tsType match {
        case org.apache.spark.sql.types.IntegerType => _.getInt(0).toLong
        case _ => _.getLong(0)
      }
      // downstream contract: emit UnsafeRow (exchanges/collect cast to it).
      // Payload attrs MUST bind as nullable here — an unmatched left row
      // carries a null payload row, and a non-nullable binding would read
      // the null slot as a raw 0/garbage value instead of NULL.
      val outAttrs = leftOut ++ payAttrs.map(_.withNullability(true))
      val resultProj = UnsafeProjection.create(
        outAttrs.map(a => a: Expression), outAttrs)

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        // rk/rt hold the rKey/rTs projection buffers for the CURRENT rRow:
        // each projection runs exactly once per cursor advance and nothing
        // else invokes those instances, so the buffers stay valid until the
        // next advance — no re-evaluation in the per-probe hot path
        private var rk: UnsafeRow = _
        private var rt: UnsafeRow = _
        // backward/nearest: latest same-key right row already passed — key,
        // payload and ts held as COPIES (the buffers above get overwritten)
        private var mKey: UnsafeRow = _
        private var mPay: UnsafeRow = _
        private var mTs: UnsafeRow = _

        private def advanceRight(): Unit = {
          rRow = if (rIter.hasNext) rIter.next() else null
          if (rRow != null) { rk = rKey(rRow); rt = rTs(rRow) }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKey(l)
          val lt = lTs(l)
          // key comparison of the current right cursor vs this probe —
          // computed once per (probe, cursor) pair
          var cmp = if (rRow == null) 1 else keyOrd.compare(rk, lk)
          var advancing = true
          while (advancing && rRow != null) {
            // backward consumes rows AT the probe ts too (inclusive match =
            // last one passed); forward must STOP on them — the first
            // same-key row at-or-after the probe IS the match, and left's
            // ascending order guarantees consumed rows are never needed
            // by a later probe
            val consume =
              cmp < 0 || (cmp == 0 && (if (forward) tsOrd.compare(rt, lt) < 0
                                       else tsOrd.compare(rt, lt) <= 0))
            if (consume) {
              if (!forward && cmp == 0) {
                mKey = rk.copy(); mPay = rPay(rRow).copy(); mTs = rt.copy()
              }
              advanceRight()
              cmp = if (rRow == null) 1 else keyOrd.compare(rk, lk)
            } else advancing = false
          }
          val pay: InternalRow =
            if (forward) {
              if (rRow != null && cmp == 0) rPay(rRow) else nullPay
            } else if (nearest) {
              // backward candidate: the held match; forward candidate: the
              // cursor row (first same-key row strictly after the probe —
              // an equal-ts row was consumed into the backward hold, so the
              // tie goes to the past, matching the window formulation)
              val backOk = mKey != null && keyOrd.compare(mKey, lk) == 0
              val fwdOk = rRow != null && cmp == 0
              if (backOk && fwdOk) {
                // NULL ts anywhere → no defined distance. Prefer the
                // candidate whose ts is non-NULL; if the probe ts (or both)
                // is NULL, take forward — the window formulation's
                // when(db <= df) is NULL there, which falls through to
                // otherwise(fwd). Never read a NULL slot as a raw 0.
                val backNull = mTs.isNullAt(0)
                val fwdNull = rt.isNullAt(0)
                if (backNull || fwdNull || lt.isNullAt(0)) {
                  if (fwdNull && !backNull) mPay else rPay(rRow)
                } else {
                  val lv = tsLong(lt)
                  if (lv - tsLong(mTs) <= tsLong(rt) - lv) mPay else rPay(rRow)
                }
              } else if (backOk) mPay
              else if (fwdOk) rPay(rRow)
              else nullPay
            } else {
              if (mKey != null && keyOrd.compare(mKey, lk) == 0) mPay else nullPay
            }
          resultProj(joined(l, pay))
        }
      }
    }
  }
}
