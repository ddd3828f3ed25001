package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Governance guard for the engine-wide scale invariant "NO PARTITION-LESS
  * WINDOW": a `Window.orderBy(...)` with an empty partitionSpec funnels the
  * ENTIRE input into one task (Spark itself only logs a WARN), which is the
  * single most common way a correct-at-test-SF query falls over at 100 TB.
  * This repo's recipes (GlobalRank / GlobalCumSum — range-partitioned
  * prefix passes) exist precisely to replace that shape, and every declared
  * query obeys the invariant; this rule makes the discipline MECHANICAL for
  * downstream users of the library.
  *
  * Opt-in (off by default — ad-hoc exploration on small data is
  * legitimate): set `spark.graft.failOnPartitionlessWindow=true` and any
  * plan that still contains a global window fails analysis loudly, naming
  * the offending window expressions and pointing at the scale-safe
  * replacement. The check runs as an optimizer rule so it sees the plan
  * AFTER rewrites — a window Catalyst manages to eliminate does not
  * false-positive.
  *
  * Cf. the same guard philosophy as `IterativeFixpoint`'s maxRounds and
  * q189's loud frontier bound: fail at plan time, never truncate or stall
  * silently at run time.
  */
object PartitionlessWindowGuard extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.failOnPartitionlessWindow"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(ConfKey, "false").toBoolean) {
      plan.foreach {
        // Any empty partitionSpec funnels the whole input into one task —
        // with ordering (global sort + window) or without (e.g.
        // `sum(x) OVER ()`, a single-task unordered frame). Both flagged.
        case w: Window if w.partitionSpec.isEmpty =>
          throw new IllegalStateException(
            "partition-less window (single-task sort over the whole input): " +
              w.windowExpressions.map(_.sql).mkString(", ") +
              " — partition the window, or use graft.operators.GlobalRank/" +
              "GlobalCumSum for global ranks and running totals " +
              s"(disable this guard via $ConfKey=false)")
        case _ =>
      }
    }
    plan
  }
}
