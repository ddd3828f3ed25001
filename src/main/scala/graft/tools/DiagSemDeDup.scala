package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup decade row with the CLUSTER-COUNT knob scaled to the corpus
  * (round 13): q287's gate runs at a FIXED 16 clusters (oracle
  * reproducibility), which makes within-cluster pair work n²/k — at a
  * fixed k that is a quadratic trap (measured: 2,581 task-s at sf1,
  * ~100× the sf0.1 gate). The production discipline (Abbas et al. 2023
  * run k ∝ corpus: 11k clusters for LAION) keeps n/k — the per-cluster
  * population — constant, so total pair work n²/k grows LINEARLY per
  * decade. This diag measures exactly that: dims (= cluster count for
  * the argmax assignment) scales 10× with the data, sf1@16 → sf10@160,
  * expecting ~10×/decade task time instead of ~100×.
  */
object DiagSemDeDup {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DiagSemDeDup <sfDir> <dims>")
    val (dir, dims) = (args(0), args(1).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.SemDeDup

    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
    })

    val docs = graft.model.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val t0 = System.nanoTime()
    val assigned = SemDeDup.assignArgmax(SemDeDup.embedBow(docs, dims))
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val marked = SemDeDup.markDropped(assigned, 990000L, "n_chars")
    val (n, dropped) = {
      val r = marked.agg(count(lit(1)), sum(when(col("dropped"), 1L).otherwise(0L)))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[diag] dir=$dir dims=$dims docs=$n dropped=$dropped " +
      f"wall=$wall%.1f s task=${taskMs.get / 1e3}%.1f s")
    spark.stop()
  }
}
