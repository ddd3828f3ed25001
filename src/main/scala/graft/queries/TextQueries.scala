package graft.queries

import org.apache.spark.sql.functions._

import graft.model.Tables
import Protocol._

/** Declared queries over `documents` — the text-analysis slice of the
  * LLM-data-pipeline extension (SURVEY §2.2 [EXT]).
  *
  * Tokenization contract: `text` is single-space-separated tokens
  * (FIXTURES §B), so Spark `split(text, ' ')` and DuckDB
  * `string_split(text, ' ')` agree exactly.
  */
object TextQueries extends QueryModule {

  override val declared: Seq[Declared] = Seq(

    // Q24 — per-language corpus stats (doc count, avg chars, avg tokens).
    Declared("q24_text_stats",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("lang"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            out6(sum(dec(col("n_chars"))) / count(lit(1))).as("avg_chars"),
            out6(sum(dec(col("n_tokens"))) / count(lit(1))).as("avg_tokens"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |  CAST(ROUND(SUM(CAST(n_chars AS DECIMAL(18,6))) / COUNT(*), 6) AS DECIMAL(18,6)) AS avg_chars,
             |  CAST(ROUND(SUM(CAST(LEN(string_split(text, ' ')) AS DECIMAL(18,6))) / COUNT(*), 6) AS DECIMAL(18,6)) AS avg_tokens
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Q25 — exact duplicate groups by content hash (md5 agrees bit-for-bit
    // across engines). At 100 TB this is the canonical exact-dedup shuffle:
    // hash once, group on the 128-bit key, never on the raw text.
    Declared("q25_exact_dedup",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
          .filter(col("n") > 1)
          .orderBy(col("h"))
      },
      Some("""SELECT md5(text) AS h, COUNT(*) AS n, MIN(doc_id) AS keep_id
             |FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
             |ORDER BY h""".stripMargin)),

    // Q25b — deduplicated corpus size.
    Declared("q25_dedup_count",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text"))).as("n_unique"))
      },
      Some("""SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique
             |FROM documents""".stripMargin))
  )
}
