package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Search-leg attribution for the IVF-PQ composition (q275/q279): build
  * the index store ONCE at SPARK_GRAFT_SF_DIR, then time the three read
  * paths on the same store — raw probed search (q255's shape), probed ADC
  * over the codes sidecar, and ADC shortlist + exact re-rank — plus the
  * bytes each scan touches. The gate rows fold the build into every
  * query; a deployment builds once and searches forever, so the search
  * leg is the number the composition is bought for.
  */
object DiagIvfPq {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.AnnIvf

    val e = graft.model.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val qs = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    qs.count()
    val centroids = Array.tabulate(8)(i =>
      Array.tabulate(64)(d => if (d == i) 1.0 else 0.0))
    val idx = java.nio.file.Files.createTempDirectory("ivfpq-diag").toString + "/idx"

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[diag] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    t("build-pq-store")({ AnnIvf.buildIndexStorePq(e, centroids, idx); 0L })
    // warm one read of each file family so the OS cache treats paths alike
    for (rep <- 1 to 2) {
      t(s"search-raw-probed-$rep") {
        AnnIvf.topKIndexedStore(spark, idx, qs, 3, centroids, nprobe = 2).count()
      }
      t(s"search-adc-probed-$rep") {
        AnnIvf.topKIndexedStoreAdc(spark, idx, qs, 3, centroids, nprobe = 2).count()
      }
      t(s"search-adc-rerank-$rep") {
        AnnIvf.topKIndexedStoreAdcRerank(spark, idx, qs, 3, 10, centroids,
          nprobe = 2).count()
      }
    }
    // bytes on disk per family — the scan bill the codes sidecar shrinks
    def bytes(d: String): Long =
      graft.streaming.BucketedStore.parquetFiles(spark, d)
        .map(f => new java.io.File(new java.net.URI(f).getPath).length()).sum
    println(s"[diag] raw-store bytes   ${bytes(idx)}")
    println(s"[diag] codes-sidecar bytes ${bytes(idx.stripSuffix("/") + "_codes")}")
    spark.stop()
  }
}
