package graft.tools

import org.apache.spark.sql.SparkSession

/** Times each SharedStages artifact build in isolation (fresh session key
  * per run via a throwaway application — the stages memoize per appId, so
  * within one JVM each build here is the FIRST build). Use to attribute the
  * `shared_stage_build` bench entry across its four stages.
  */
object StageTimes {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[stage] $name%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // each call materializes its stage (and, cumulatively, its inputs —
    // so the deltas attribute: shingles, sigs-given-shingles, …)
    t("shingles") { graft.queries.SharedStages.docShingles(spark, dir).count() }
    t("sigs")     { graft.queries.SharedStages.minhashSigs(spark, dir).count() }
    t("lshpairs") { graft.queries.SharedStages.lshPairs(spark, dir).count() }
    t("clusters") { graft.queries.SharedStages.dedupClusters(spark, dir).count() }
    spark.stop()
  }
}
