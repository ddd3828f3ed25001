package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B for the q268 width-profile rewrite: the round-10 4-scan
  * shape (one gram aggregate per width, corpus re-scanned per arm) vs the
  * round-11 one-scan shape (all widths tagged out of one projection into a
  * persisted per-(w, gram, doc) aggregate). Prints wall + summed task time
  * for each shape at SPARK_GRAFT_SF_DIR.
  */
object DiagQ268 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.queries.Protocol.GuardConfKey, "off")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
    })
    def timed(name: String)(body: => Unit): Unit = {
      try org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark, 30000) catch { case _: Throwable => }
      val (t0, w0) = (taskMs.get, System.nanoTime())
      body
      try org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark, 30000) catch { case _: Throwable => }
      println(f"[diag268] $name wall=${(System.nanoTime() - w0) / 1e9}%.1f s task=${(taskMs.get - t0) / 1e3}%.1f s")
      spark.catalog.clearCache(); System.gc()
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.model.Tables.load(spark, dir, "documents").select("doc_id", "text")
    import graft.queries.Protocol.big

    timed("old-4scan") {
      force(Seq(4, 8, 16, 32).map { w =>
        val g = graft.operators.DupSpans.grams(docs, w)
        val dup = g.groupBy(col("gh"))
          .agg(count(lit(1)).as("n")).where(col("n") >= 2)
        val flagged = g.join(dup.select("gh"), "gh")
        dup.agg(big(count(lit(1))).as("dup_grams")).crossJoin(
          flagged.agg(big(count(lit(1))).as("flagged_occ"),
            big(countDistinct(col("doc_id"))).as("affected_docs")))
          .select(lit(w.toLong).as("w"), col("dup_grams"),
            col("flagged_occ"), col("affected_docs"))
      }.reduce(_ unionAll _).orderBy(col("w")))
    }
    timed("new-1scan") {
      force(graft.SparkEntry.queries("q268_dup_width_profile")(spark, dir))
    }
    spark.stop()
  }
}
