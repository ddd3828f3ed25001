package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical backward as-of join — the whole-operator Catalyst path (SURVEY
  * §7.3 option c): a first-class plan node the planner lowers to
  * [[AsOfJoinExec]] via [[AsOfJoinStrategy]], instead of the
  * union+window *encoding* in `operators.AsOfJoin` (kept as the
  * pure-DataFrame formulation; q36/q69 pin both against DuckDB's native
  * ASOF JOIN).
  *
  * Semantics: for every left row, the latest right row with the same `keys`
  * and `rightTs <= leftTs` (inclusive), left-outer — unmatched left rows get
  * NULL payload. `payload` are attributes of `right`'s output (pre-aliased
  * by the caller to their emitted names); they become nullable in the
  * output. NULL keys group like values (both sides' NULL-key rows can
  * match), mirroring the window formulation's partitionBy semantics.
  *
  * Mirrors the reference's latest-tick-at-or-before-t lookup
  * (`/root/reference/lambda_function.py:26` tables queried with MySQL 5.7
  * correlated-subquery emulation) as one native operator.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    direction: AsOfDirection = AsOfBackward) extends BinaryNode {

  // fail at plan-construction time, not with a ClassCastException (or a
  // silent garbage comparison for same-width types) inside an executor:
  // the exec's orderings are built from the LEFT side's types and applied
  // to BOTH sides, so the sides must agree exactly
  if ((leftKeys ++ rightKeys :+ leftTs :+ rightTs).forall(_.resolved)) {
    require(leftKeys.length == rightKeys.length &&
      leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType == r.dataType },
      s"as-of join key types must match pairwise: " +
        s"${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
    require(leftTs.dataType == rightTs.dataType,
      s"as-of join ts types must match: ${leftTs.dataType} vs ${rightTs.dataType}")
    if (direction == AsOfNearest) {
      import org.apache.spark.sql.types.{IntegerType, LongType, TimestampNTZType, TimestampType}
      // TimestampNTZ is physically long micros, same as TimestampType — the
      // exec's distance reads both through getLong.
      require(Seq(TimestampType, TimestampNTZType, LongType, IntegerType).contains(leftTs.dataType),
        s"nearest as-of needs a timestamp or integral ts for the distance; got ${leftTs.dataType}")
    }
  }

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy lowering [[AsOfJoinPlan]] → [[AsOfJoinExec]]. Installed
  * by `graft.GraftExtensions` (cluster deployment:
  * `--conf spark.sql.extensions=graft.GraftExtensions`) and added
  * idempotently to `experimental.extraStrategies` by the
  * `operators.AsOfJoin.backwardNative` API for plain sessions.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, pay, dir) =>
      AsOfJoinExec(lk, rk, lts, rts, pay, dir, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Match direction of the native as-of operator. */
sealed trait AsOfDirection
/** latest right with rTs <= lTs (inclusive) */
case object AsOfBackward extends AsOfDirection
/** earliest right with rTs >= lTs (inclusive) */
case object AsOfForward extends AsOfDirection
/** closer of the two by |Δts| (ties → backward). Needs a numeric-comparable
  * ts (timestamp or integral) for the distance — enforced at plan
  * construction. The merge runs in backward mode and decides against the
  * cursor row, which at probe time IS the forward candidate.
  */
case object AsOfNearest extends AsOfDirection
