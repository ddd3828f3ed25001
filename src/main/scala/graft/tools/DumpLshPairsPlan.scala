package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.queries.{DedupQueries, Protocol, SharedStages}

/** Before/after plan evidence for the r14 lshPairs rewrite (narrow
  * candidates through the band join + pair dedup, signatures re-attached
  * after). The "before" frame reproduces the pre-r14 build expression
  * verbatim (git 96bb636 SharedStages.lshPairs) so the two
  * `.explain("formatted")` dumps are directly comparable; the stage is a
  * materialized build, not a declared query, so PlanDump cannot capture it.
  *
  * Usage: runMain graft.tools.DumpLshPairsPlan <outDir>
  */
object DumpLshPairsPlan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DumpLshPairsPlan <outDir>")
    val outDir = args(0)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import DedupQueries.{BANDS, K, ROWS}
    val sigs = SharedStages.minhashSigs(spark, dir)

    // BEFORE (pre-r14): sig arrays ride both sides of the band self-join
    // and the (id_a, id_b) dedup exchange
    val bandedOld = sigs.select(col("doc_id"), col("sig"),
      posexplode(bandKeys(col("sig"), BANDS, ROWS)).as(Seq("band_idx", "band")))
    val aOld = bandedOld.select(col("band_idx"), col("band"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val bOld = bandedOld.select(col("band_idx"), col("band"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val before = aOld.join(bOld, Seq("band_idx", "band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard",
        Protocol.out6(Protocol.dec(sigMatchCount(col("sig_a"), col("sig_b"), K)) / K))
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))

    // AFTER (r14): the committed SharedStages.lshPairs build shape, rebuilt
    // unmaterialized so explain() shows the physical plan
    val banded = sigs.select(col("doc_id"),
      posexplode(bandKeys(col("sig"), BANDS, ROWS)).as(Seq("band_idx", "band")))
    val a = banded.select(col("band_idx"), col("band"), col("doc_id").as("id_a"))
    val b = banded.select(col("band_idx"), col("band"), col("doc_id").as("id_b"))
    val cand = a.join(b, Seq("band_idx", "band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sa = sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val after = cand.join(sa, Seq("id_a"))
      .join(sb, Seq("id_b"))
      .withColumn("est_jaccard",
        Protocol.out6(Protocol.dec(sigMatchCount(col("sig_a"), col("sig_b"), K)) / K))
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))

    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val p = java.nio.file.Paths.get(outDir, name)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, txt)
      println(s"[plandump] wrote $p (${txt.length} chars)")
    }
    dump(before, "lshpairs_stage_before.txt")
    dump(after, "lshpairs_stage_after.txt")
    spark.stop()
  }
}
