package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Phase-level attribution for the BPE train/encode pipeline (q259/q261) —
  * times each stage in isolation at SPARK_GRAFT_SF_DIR: the token-array
  * cache build, one pair-count round over the cache, and the greedy merge
  * in BOTH formulations — the original whole-array fold (O(len²) element
  * copies per doc, kept here as the measured control) vs the staged
  * match-position rewrite BpeTrainer now uses (O(len + matches²)).
  */
object DiagBpe {
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
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[diag] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.model.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    force(docs) // warm the scan

    val seqs = docs.select(col("doc_id"), tokens(col("text")).as("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("cache-build")(seqs.count())
    t("cache-rescan")(seqs.count())

    t("pair-agg-top1") {
      seqs.select(explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"))
        .select(col("p.l"), col("p.r"))
        .groupBy(col("l"), col("r")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
    }

    // one greedy-merge rewrite (uses an arbitrary frequent pair)
    val model = graft.operators.BpeTrainer.train(spark, docs.limit(1000), 1)
    val m = model.head
    def applyMerge(a: String, b: String) = {
      def q(s: String) = "'" + s.replace("'", "''") + "'"
      expr(s"""aggregate(syms, cast(array() as array<string>),
        |  (acc, x) -> CASE
        |    WHEN size(acc) > 0 AND element_at(acc, -1) = ${q(a)} AND x = ${q(b)}
        |    THEN concat(slice(acc, 1, size(acc) - 1), array(${q(a + " " + b)}))
        |    ELSE concat(acc, array(x)) END)""".stripMargin)
    }
    t("merge-old-fold") {
      force(seqs.select(col("doc_id"), applyMerge(m.left, m.right).as("syms")))
    }
    t("encode-3fold-old") {
      val folded = Seq(m, m, m).foldLeft(
        docs.select(col("doc_id"), tokens(col("text")).as("syms"))) {
        (df, mm) => df.select(col("doc_id"), applyMerge(mm.left, mm.right).as("syms"))
      }
      force(folded.select(col("doc_id"), size(col("syms")).as("n")))
    }
    t("encode-3fold-staged") {
      force(graft.operators.BpeTrainer.encode(docs, Seq(m, m, m))
        .select(col("doc_id"), size(col("syms")).as("n")))
    }
    seqs.unpersist()

    // SEQUENTIAL vs BATCHED training A/B (round 12): same target of 4
    // merges — one corpus aggregate per merge vs one per round at beam 2.
    // The scan count is the law; the seconds show what it buys at this SF.
    t("train-seq-4merges") {
      val ms = graft.operators.BpeTrainer.train(spark, docs, 4)
      println(s"[diag]   sequential: ${ms.length} merges, 4 corpus aggregates")
    }
    t("train-batched-2x2") {
      val (ms, scans) =
        graft.operators.BpeTrainer.trainBatched(spark, docs, outerRounds = 2, beam = 2)
      println(s"[diag]   batched: ${ms.length} merges, $scans corpus aggregates")
    }
    t("train-batched-2x4") {
      val (ms, scans) =
        graft.operators.BpeTrainer.trainBatched(spark, docs, outerRounds = 2, beam = 4)
      println(s"[diag]   batched: ${ms.length} merges, $scans corpus aggregates")
    }
    spark.stop()
  }
}
