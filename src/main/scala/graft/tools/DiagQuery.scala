package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Runs ONE declared query through the noop sink (Bench's methodology) and
  * prints a per-JOB timeline: job id, wall seconds, summed task seconds and
  * the GAP since the previous job ended — gaps are driver-side time
  * (planning, persist bookkeeping, AQE re-optimization), which per-query
  * wall-vs-task discrepancies in the bench cannot attribute by themselves.
  *
  * Usage: runMain graft.tools.DiagQuery <queryName>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object DiagQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DiagQuery <queryName>")
    val name = args(0)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    val t0 = new java.util.concurrent.atomic.AtomicLong(0L)
    val lastEnd = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime())
        j.stageIds.foreach(sid => stageJob.put(sid, j.jobId))
        taskMs.put(j.jobId, new java.util.concurrent.atomic.AtomicLong(0L))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val jid = stageJob.getOrDefault(t.stageId, -1)
        if (jid >= 0 && t.taskMetrics != null)
          taskMs.get(jid).addAndGet(t.taskMetrics.executorRunTime)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val now = System.nanoTime()
        val st = starts.getOrDefault(j.jobId, now)
        val gap = (st - (if (lastEnd.get == 0) t0.get else lastEnd.get)) / 1e9
        lastEnd.set(now)
        val task = Option(taskMs.get(j.jobId)).map(_.get / 1e3).getOrElse(0.0)
        println(f"[diagq] job=${j.jobId}%4d wall=${(now - st) / 1e9}%7.2f s task=$task%8.1f s gap_before=$gap%7.2f s")
      }
    })

    // warmup like Bench
    try {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$dir/lineitem.parquet").limit(10000)
      li.groupBy("l_returnflag").agg(sum("l_quantity")).orderBy("l_returnflag")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }
    Thread.sleep(500)
    println(s"[diagq] === running $name ===")
    t0.set(System.nanoTime())
    lastEnd.set(0L)
    val w0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    println(f"[diagq] TOTAL wall=${(System.nanoTime() - w0) / 1e9}%.2f s")
    org.apache.spark.sql.GraftSqlBridge.stopStateStores()
    spark.stop()
  }
}
