package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Runs ONE declared query through the noop sink and prints the top stages
  * by summed task time, with their callsite names — the attribution level
  * between DiagQuery's per-job view and the Spark UI this sandbox lacks.
  *
  * Usage: runMain graft.tools.DiagStages <queryName> [topN]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object DiagStages {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DiagStages <queryName> [topN]")
    val name = args(0)
    val topN = args.lift(1).map(_.toInt).getOrElse(20)
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

    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val tasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        names.put(s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '\n'))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          taskMs.computeIfAbsent(t.stageId, _ => new java.util.concurrent.atomic.AtomicLong())
            .addAndGet(t.taskMetrics.executorRunTime)
          tasks.computeIfAbsent(t.stageId, _ => new java.util.concurrent.atomic.AtomicLong())
            .incrementAndGet()
        }
    })

    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    try org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark, 30000)
    catch { case _: Throwable => }
    import scala.jdk.CollectionConverters._
    val rows = taskMs.asScala.toSeq.sortBy(-_._2.get).take(topN)
    println(f"[diagst] $name wall=$wall%.2f s, total task=${taskMs.asScala.values.map(_.get).sum / 1e3}%.1f s")
    rows.foreach { case (sid, ms) =>
      println(f"[diagst] stage=$sid%5d task=${ms.get / 1e3}%8.2f s n=${tasks.get(sid).get}%4d  ${names.getOrDefault(sid, "?").take(110)}")
    }
    org.apache.spark.sql.GraftSqlBridge.stopStateStores()
    spark.stop()
  }
}
