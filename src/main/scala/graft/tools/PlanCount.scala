package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Prints tree-based physical node counts (shuffle exchanges, broadcast
  * exchanges, cache-read sites) per query — the measurement side of
  * PlanBudgetSpec's budgets. AQE is disabled so the counted tree is the
  * deterministic statically-planned shape, not a runtime re-plan.
  */
object PlanCount {
  def counts(plan: SparkPlan): (Int, Int, Int) = (
    plan.collect { case _: ShuffleExchangeExec => 1 }.sum,
    plan.collect { case _: BroadcastExchangeExec => 1 }.sum,
    plan.collect { case _: InMemoryTableScanExec => 1 }.sum)

  def main(args: Array[String]): Unit = {
    // extensions match PlanBudgetSpec's session: the native as-of family
    // plans through GraftExtensions' strategy, so counting without it
    // would measure a different (fallback) plan shape
    val sp = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.headOption.map(_.split(",").toSeq).getOrElse(Seq.empty).foreach { name =>
      val df = graft.SparkEntry.queries(name)(sp, dir)
      val (s, b, c) = counts(df.queryExecution.executedPlan)
      println(s"PLANCOUNT $name shuffles=$s broadcasts=$b cacheReads=$c")
    }
    sp.stop()
  }
}
