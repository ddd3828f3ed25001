package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-STAGE task attribution for the q285 gate run under the exact Bench
  * session config (AQE on, extensions, noop force) — the round-13 anomaly
  * chase: leg-level diags swing 9× between identical runs, so this pins
  * WHERE the task seconds land (stage name + task count + run time + GC).
  */
object DiagQ285Stages {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/out/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val query = args.headOption.getOrElse("q285_quantile_sketch_audit")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.queries.Protocol.GuardConfKey, "off")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class S(var name: String = "", var tasks: Int = 0,
        var runMs: Long = 0L, var gcMs: Long = 0L, var cpuMs: Long = 0L)
    val stages = scala.collection.concurrent.TrieMap[Int, S]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        stages.getOrElseUpdate(e.stageInfo.stageId, S()).name = e.stageInfo.name
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val s = stages.getOrElseUpdate(t.stageId, S())
        val m = t.taskMetrics
        if (m != null) {
          s.tasks += 1; s.runMs += m.executorRunTime; s.gcMs += m.jvmGCTime
          s.cpuMs += m.executorCpuTime / 1000000L
        }
      }
    })

    val t0 = System.nanoTime()
    graft.SparkEntry.queries(query)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    try org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark, 30000)
    catch { case _: Throwable => }
    println(f"[diag] $query wall=$wall%.1f s; stages by task time:")
    stages.toSeq.sortBy(-_._2.runMs).take(12).foreach { case (id, s) =>
      println(f"[diag]   stage $id%4d tasks=${s.tasks}%4d run=${s.runMs / 1e3}%8.1f s " +
        f"cpu=${s.cpuMs / 1e3}%8.1f s gc=${s.gcMs / 1e3}%7.1f s  ${s.name.take(90)}")
    }
    spark.stop()
  }
}
