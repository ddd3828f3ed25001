package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway attribution harness for the q215 cascade's sf1 rehearsal:
  * times each tier in isolation (same plans as the declared query) so a
  * superlinear scale-up can be pinned to a stage instead of guessed at.
  */
object Diag215 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/out/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[diag215] $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s  n=$n")
    }
    val docs = graft.model.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val wEx = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val exactD = docs.withColumn("rn", row_number().over(wEx))
      .filter(col("rn") > 1).select(col("doc_id"))
    t("a_exact") { exactD.count() }
    val s1 = docs.join(exactD, Seq("doc_id"), "left_anti")
    val bowToks = array_sort(array_distinct(filter(
      split(lower(col("text")), "[^a-z0-9]+"), x => x =!= lit(""))))
    val wBow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id"))
    val bowD = s1.withColumn("fp", md5(array_join(bowToks, " ")))
      .withColumn("rn", row_number().over(wBow))
      .filter(col("rn") > 1).select(col("doc_id"))
    t("b_bow") { bowD.count() }
    val s2 = s1.join(bowD, Seq("doc_id"), "left_anti")
    val recs2 = s2.select(col("doc_id"),
      graft.functions.TextFunctions.shingles3(col("text")).as("tk"))
    val containD = graft.operators.SetSimJoin
      .containmentJoin(recs2, "doc_id", "tk", 9, 10)
      .where(col("sb") > col("sa") ||
        (col("sb") === col("sa") && col("id_b") < col("id_a")))
      .select(col("id_a").as("doc_id")).distinct()
    t("c_contain") { containD.count() }
    val s3 = s2.join(containD, Seq("doc_id"), "left_anti")
    val s3ids = s3.select(col("doc_id"))
    t("d_lshpairs") { graft.queries.SharedStages.lshPairs(spark, dir).count() }
    val nearD = graft.queries.DedupQueries.lshNearPairs(spark, dir)
      .join(s3ids.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
      .join(s3ids.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi")
      .select(col("id_b").as("doc_id")).distinct()
    t("d_near") { nearD.count() }
    val kept = s3.join(nearD, Seq("doc_id"), "left_anti")
    t("e_kept") { kept.count() }
    spark.stop()
  }
}
