package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-key-domain decade row for the q278 composition (VERDICT r12 #8):
  * the gate fixture's key domain (events.user_id) grows 10× with SF, so
  * q278's recorded 7.8×/decade mixes operator cost with fixture shape.
  * This diag pins the operator alone: key = user_id % 3000 (domain fixed
  * at every SF), the same 4-batch ingestHeavyHitters + verifiedHeavyHitters
  * composition, threshold = 1.2× the mean key count (so the hitter share
  * is comparable across SFs). With the domain pinned, the sketch legs'
  * per-batch work is the batch's own delta + a ≤3000-key estimate — the
  * decade ratio should track the DATA (the batch scans), not the key
  * space. Run at out/sf1 then out/sf10.
  */
object DiagCmsDomain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/out/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.CountMinSketch

    val ev = graft.model.Tables.load(spark, dir, "events")
      .select(col("user_id"), pmod(col("user_id"), lit(3000L)).as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = ev.count()
    val threshold = math.max(1L, n * 12 / (3000 * 10)) // 1.2× mean key count
    val base = java.nio.file.Files.createTempDirectory("cms-domain").toString
    val (feed, cand) = (s"$base/cms", s"$base/cand")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s ($r rows)")
    }
    println(s"[diag] dir=$dir rows=$n threshold=$threshold domain=3000")
    t("ingest-4-batches") {
      for (b <- 0L until 4L)
        CountMinSketch.ingestHeavyHitters(
          ev.filter(pmod(col("user_id"), lit(4L)) === b), "k", feed, cand,
          threshold, b)
      0L
    }
    t("verify-exact") {
      CountMinSketch.verifiedHeavyHitters(spark, ev, "k", cand, threshold).count()
    }
    ev.unpersist()
    spark.stop()
  }
}
