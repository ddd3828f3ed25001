package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Runs a comma-list of declared queries (or all, with "all") once each
  * through the noop sink and prints per query: wall, summed task seconds,
  * and DRIVER GAP — wall minus time covered by at least one running job —
  * the planning/persist-bookkeeping component the bench's wall-vs-task
  * split cannot attribute. Queries whose gap dominates wall are
  * plan-planning-bound (the q215 round-13 pathology), not executor-bound.
  *
  * Usage: runMain graft.tools.DiagGaps <q1,q2,...|all>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object DiagGaps {
  def main(args: Array[String]): Unit = {
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
    spark.sparkContext.setLogLevel("ERROR")

    // job intervals, merged on the driver at read time
    val intervals = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = starts.getOrDefault(j.jobId, System.nanoTime())
        intervals.add((st, System.nanoTime()))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
    })
    def drain(): Unit =
      try org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark, 30000)
      catch { case _: Throwable => }

    // warmup
    try {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$dir/lineitem.parquet").limit(10000)
      li.groupBy("l_returnflag").agg(sum("l_quantity")).orderBy("l_returnflag")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }

    val names: Seq[String] =
      if (args.headOption.contains("all")) graft.SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    println(f"${"query"}%-36s ${"wall"}%8s ${"task"}%9s ${"gap"}%8s")
    names.foreach { name =>
      drain(); intervals.clear(); taskMs.set(0L)
      val t0 = System.nanoTime()
      val ok = try {
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable =>
        System.err.println(s"[gaps] $name FAILED: ${e.getMessage}"); false }
      val t1 = System.nanoTime()
      drain()
      if (ok) {
        import scala.jdk.CollectionConverters._
        val ivs = intervals.asScala.toSeq
          .map { case (a, b) => (math.max(a, t0), math.min(b, t1)) }
          .filter(p => p._2 > p._1).sortBy(_._1)
        var covered = 0L; var cursor = t0
        ivs.foreach { case (a, b) =>
          if (b > cursor) { covered += b - math.max(a, cursor); cursor = math.max(cursor, b) }
        }
        val wall = (t1 - t0) / 1e9
        println(f"$name%-36s $wall%8.2f ${taskMs.get / 1e3}%9.1f ${wall - covered / 1e9}%8.2f")
      }
      spark.catalog.clearCache(); System.gc()
    }
    org.apache.spark.sql.GraftSqlBridge.stopStateStores()
    spark.stop()
  }
}
