package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Distributed BPE tokenizer TRAINING — the merge-learning loop on top of
  * q81's pair statistics (which only OBSERVES one round's counts): for R
  * rounds, count adjacent symbol pairs across the corpus, pick the most
  * frequent pair (ties lexicographic, so the model is a pure function of
  * the corpus), and greedily merge its occurrences left-to-right in every
  * document. The learned merge table IS the tokenizer model — the
  * word-level analogue of the byte-pair vocabularies LLM pipelines train.
  *
  * Greedy semantics (the standard ones): pair counts include overlapping
  * occurrences; application is a single left-to-right pass per document,
  * so a run like `x x x x` under merge (x,x) becomes `xx xx` (positions
  * 1 and 3 — odd ranks within a contiguous match run). The in-row fold
  * implements exactly that rule: merge when the accumulator's LAST symbol
  * equals the left part and the incoming symbol equals the right part — a
  * freshly-merged symbol can never re-match the left part within the same
  * round (it is strictly longer than it), so the fold cannot chain-merge.
  *
  * Scale shape: each round is one corpus-wide pair aggregate (map-side
  * partial counts, TakeOrdered(1) — never a global sort) plus one in-row
  * rewrite (codegen'd HOF, no explode of the rewritten corpus). Driver
  * traffic is the MODEL: one (left, right, count) row per round — the
  * AnnIvf-centroids pattern. Round frames persist and the previous round
  * unpersists once its successor materializes, so lineage stays one round
  * deep. R full corpus passes are the algorithm's intrinsic cost; nothing
  * here adds a term that grows with vocabulary or history.
  */
object BpeTrainer {

  /** One learned merge: round number (1-based), the pair, its count. */
  final case class Merge(merge_round: Int, left: String, right: String,
      pair_count: Long)

  /** Train `rounds` merges over (doc_id, text). Returns the merge table in
    * learning order; stops early if no adjacent pair remains.
    */
  def train(spark: SparkSession, docs: DataFrame, rounds: Int): Seq[Merge] = {
    require(rounds >= 1, "need at least one merge round")
    var seqs = docs
      .select(col("doc_id"), tokens(col("text")).as("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    seqs.count()
    val merges = Seq.newBuilder[Merge]
    try {
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        // adjacent pairs as STRUCTS (never joined strings: merged symbols
        // contain spaces, so string-splitting a pair would be ambiguous)
        val top = seqs
          .select(explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
            slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"))
          .select(col("p.l"), col("p.r"))
          .groupBy(col("l"), col("r")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += Merge(r, a, b, c)
          val next = seqs
            .select(col("doc_id"), applyMerge(a, b).as("syms"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          seqs.unpersist()
          seqs = next
          r += 1
        }
      }
      merges.result()
    } finally seqs.unpersist()
  }

  /** The merge table as a DataFrame. Columns `lhs`/`rhs` (not LEFT/RIGHT —
    * reserved words in every SQL dialect the oracle runs in).
    */
  def trainDF(spark: SparkSession, docs: DataFrame, rounds: Int): DataFrame = {
    import spark.implicits._
    train(spark, docs, rounds)
      .toDF("merge_round", "lhs", "rhs", "pair_count")
      .select(col("merge_round").cast("long"), col("lhs"), col("rhs"),
        col("pair_count"))
  }

  /** ENCODE: tokenize (doc_id, text) with an already-trained merge table —
    * the apply side of the model train() learns. Each merge is the same
    * left-to-right greedy pass training used, applied in learning order, so
    * encode(corpus, train(corpus, R)) reproduces training's final state by
    * construction (the spec pins it). The scale story is the point: the
    * whole encoder is R nested in-row folds inside ONE projection — a
    * single shuffle-free corpus pass, embarrassingly parallel, no joins, no
    * aggregates; the model rides into every task as R string literals
    * (broadcast-by-plan, the way a real tokenizer ships its merge table).
    *
    * Returns (doc_id, syms) — the tokenized sequence per document.
    */
  def encode(docs: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(
      docs.select(col("doc_id"), tokens(col("text")).as("syms"))) {
      (df, m) => df.select(col("doc_id"), applyMerge(m.left, m.right).as("syms"))
    }

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Left-to-right greedy single-pass merge of (a, b) over `syms`, in-row. */
  private def applyMerge(a: String, b: String) = expr(
    s"""aggregate(syms, cast(array() as array<string>),
       |  (acc, x) -> CASE
       |    WHEN size(acc) > 0 AND element_at(acc, -1) = ${sqlLit(a)}
       |         AND x = ${sqlLit(b)}
       |    THEN concat(slice(acc, 1, size(acc) - 1), array(${sqlLit(a + " " + b)}))
       |    ELSE concat(acc, array(x)) END)""".stripMargin)
}
