package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway per-batch attribution for q250's incremental-CC sink. */
object Diag250 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.model.Tables.load(spark, dir, "events")
      .filter(col("event_id") % 17 === 0)
      .select((col("event_id") % 997).as("u"),
        ((col("event_id") * 31 + 7) % 997).as("v"))
    val src = java.nio.file.Files.createTempDirectory("icc-src").toString
    edges.repartition(4).write.mode("overwrite").parquet(src)
    val files = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    val out = java.nio.file.Files.createTempDirectory("icc-diag").toString
    val sink = graft.streaming.IncrementalCC.ccSink(out)
    files.zipWithIndex.foreach { case (f, i) =>
      val t0 = System.nanoTime()
      sink(spark.read.parquet(f), i.toLong)
      println(f"[diag250] batch $i ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
