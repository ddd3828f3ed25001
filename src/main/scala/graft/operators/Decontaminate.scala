package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.shinglesDistinct

/** Benchmark decontamination by token n-gram overlap (SURVEY §2.2 [EXT]):
  * flag every training document that shares at least one n-gram with a
  * held-out eval set — the standard recipe from the public GPT-3 appendix C
  * and FLAN papers, which use 13-grams over whitespace tokens.
  *
  * Shape (100 TB): the eval set is bounded by construction (benchmarks are
  * thousands of documents, not billions), so its distinct shingle set is
  * broadcast and the training corpus streams through map-side — one scan,
  * one codegen'd shingling pass, one broadcast-hash join, one partial-agg
  * count per hit document. Nothing all-pairs, nothing corpus-sized on the
  * build side. q61 runs the same core over the fixture config (width 3 on
  * the 10-99-token synthetic docs); CurationSpec exercises the width-13
  * default on a synthetic eval set.
  */
object Decontaminate {

  /** Flag training documents overlapping the eval set.
    *
    * @param train   training corpus carrying `idCol` and `textCol`
    * @param evalSet held-out eval documents carrying `textCol`; must be
    *                small enough to broadcast its distinct n-gram set
    * @param n       n-gram width (13 = public GPT-3/FLAN recipe)
    * @return (idCol, n_hits) — one row per CONTAMINATED training document,
    *         n_hits = number of its shingle occurrences found in the eval set
    */
  def apply(train: DataFrame, evalSet: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 13): DataFrame =
    fromShingles(
      train.select(col(idCol), explode(shinglesDistinct(col(textCol), n)).as("sh")),
      evalSet.select(explode(shinglesDistinct(col(textCol), n)).as("sh")),
      idCol)

  /** Core on pre-shingled frames — lets callers reuse a materialized shingle
    * stage (q61 feeds SharedStages.docShingles) instead of re-shingling.
    *
    * @param trainSh (idCol, sh) one row per (train doc, distinct shingle)
    * @param evalSh  (sh) eval shingle occurrences (deduplicated here)
    */
  def fromShingles(trainSh: DataFrame, evalSh: DataFrame, idCol: String = "doc_id"): DataFrame =
    trainSh
      .join(broadcast(evalSh.select(col("sh")).distinct()), "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
}
