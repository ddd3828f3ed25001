package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measures total shuffle-WRITE records for named declared queries with
  * auto-broadcast disabled — the measurement side of PlanBudgetSpec's
  * RUNTIME budgets (static tree counts can't see per-round exchanges in
  * loop-driven operators; shuffle records can).
  *
  *   sbt "runMain graft.tools.ShuffleRecords q189_bfs_hops q205_kcore"
  *
  * Broadcast is off so the number is the plan's full shuffle volume, not
  * whatever AQE happened to elide at this tiny SF — same discipline as the
  * q117 budget. SF dir via SPARK_GRAFT_SF_DIR (default sf0.001: budgets
  * are pinned at the smallest fixture so the suite stays fast).
  */
object ShuffleRecords {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val records = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        records.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })
    // Drain the listener bus (bounded wait) BEFORE the settle loop: stage
    // events can arrive well after count() returns, and a sleep-only settle
    // window under-counts them. The drain guarantees every already-posted
    // event is delivered; the short settle after it only covers stragglers
    // posted during the drain itself.
    def settle(): Long = {
      try org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark, 30000)
      catch { case _: Throwable => }
      var (prev, n) = (-1L, 0)
      while (n < 3) {
        Thread.sleep(200)
        val cur = records.get()
        if (cur == prev) n += 1 else { prev = cur; n = 0 }
      }
      records.get()
    }
    val known = graft.SparkEntry.queries
    val unknown = args.filterNot(known.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — valid names are declared " +
        s"SparkEntry.queries keys, e.g. ${known.keys.toSeq.sorted.take(5).mkString(", ")}, …")
    args.foreach { name =>
      val before = settle()
      val rows = known(name)(spark, sfDir).count()
      val got = settle() - before
      println(f"[shuffle-records] $name%-28s $got%8d records ($rows rows)")
    }
    spark.stop()
  }
}
