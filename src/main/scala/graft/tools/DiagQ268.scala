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
    import graft.functions.TextFunctions.{shingles, tokens}
    import graft.queries.Protocol.big

    // the SHIPPED shape (q268 as declared: four independent per-width arms)
    timed("4scan-arms (shipped)") {
      force(graft.SparkEntry.queries("q268_dup_width_profile")(spark, dir))
    }
    // the RETIRED fused one-scan shape, kept inline so the A/B that
    // retired it stays reproducible: all widths' grams tagged out of one
    // projection into a shared per-(w, gram, doc) aggregate (measured
    // 1.5-2.3× worse at sf10 — see BASELINE round-11)
    timed("fused-1scan (retired)") {
      val widths = Seq(4, 8, 16, 32)
      val tagged = docs
        .select(col("doc_id"), size(tokens(col("text"))).as("len"),
          explode(flatten(array(widths.map(w =>
            transform(shingles(col("text"), w),
              gr => struct(lit(w.toLong).as("w"), md5(gr).as("gh")))): _*))).as("t"))
        .where(col("len") >= col("t.w"))
        .select(col("doc_id"), col("t.w").as("w"), col("t.gh").as("gh"))
      val perDoc = tagged.groupBy(col("w"), col("gh"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dup = perDoc.groupBy(col("w"), col("gh"))
        .agg(sum(col("c")).as("n")).where(col("n") >= 2)
      force(perDoc.join(dup.select("w", "gh"), Seq("w", "gh"))
        .groupBy(col("w"))
        .agg(big(countDistinct(col("gh"))).as("dup_grams"),
          big(sum(col("c"))).as("flagged_occ"),
          big(countDistinct(col("doc_id"))).as("affected_docs"))
        .orderBy(col("w")))
      perDoc.unpersist()
    }
    spark.stop()
  }
}
