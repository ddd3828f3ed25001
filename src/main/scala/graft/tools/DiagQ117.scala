package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-off: per-stage shuffle-record breakdown for q117 with broadcast
  * off — calibrates PlanBudgetSpec's record budget.
  */
object DiagQ117 {
  def main(args: Array[String]): Unit = {
    val sp = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    sp.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m.shuffleWriteMetrics.recordsWritten > 0)
          lines.add(f"stage ${e.stageInfo.stageId}%4d ${e.stageInfo.name.take(60)}%-60s write=${m.shuffleWriteMetrics.recordsWritten}")
      }
    })
    val n = graft.SparkEntry.queries("q117_fixpoint_chain")(sp, "/root/testdata/sf0.001").count()
    Thread.sleep(1500)
    lines.forEach(l => println(s"DIAG $l"))
    println(s"DIAG total rows=$n")
    sp.stop()
  }
}
