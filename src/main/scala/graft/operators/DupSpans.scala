package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{shingles, tokens}

/** Exact duplicated-span detection — the suffix-array-style substring dedup
  * of Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
  * Better", arXiv:2107.06499) re-expressed as dataflow. Emits every MAXIMAL
  * token span that occurs at least twice anywhere in the corpus (across
  * documents or within one).
  *
  * The suffix-array insight a relational engine can use directly: any
  * duplicated span of length ≥ W contains a duplicated W-gram, and a RUN of
  * consecutive duplicated W-gram start positions IS the maximal span
  * (run start .. run end + W−1). So the whole operator is:
  *
  *   posexplode W-token shingles (1-based positions)
  *     → md5 the gram (the shuffle carries 32-hex keys, never text)
  *     → global occurrence count ≥ 2           (map-side-partial hash agg)
  *     → join positions back on the hash key   (hash equi-join)
  *     → per-doc islands coalesce (pos − row_number over doc_id)
  *     → (doc_id, span_start, span_end, span_tokens)
  *
  * Scale: no all-pairs term anywhere — the only quadratic-looking step, the
  * occurrence count, is a hash aggregate over (hash, count) rows; the only
  * per-document state is the islands window, partitioned by doc_id. Unlike
  * MinHash this is EXACT: a 1-token edit inside a long duplicated span
  * SPLITS the reported span in two (both halves still found), it cannot
  * hide it. Documents shorter than W tokens have no W-gram and are out of
  * scope by definition of the span width.
  */
object DupSpans {

  /** W-gram occurrences of (doc_id, text) as (doc_id, pos, gh): 1-based
    * token start position, md5 of the gram text (shuffles downstream carry
    * 32-hex keys, never text). Documents shorter than `width` tokens have
    * no W-gram and drop out here.
    */
  def grams(docs: DataFrame, width: Int): DataFrame = {
    require(width >= 2, "span width must be at least 2 tokens")
    docs
      .select(col("doc_id"), col("text"))
      .where(size(tokens(col("text"))) >= width)
      .select(col("doc_id"),
        posexplode(shingles(col("text"), width)).as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        md5(col("gram")).as("gh"))
  }

  /** Coalesce flagged gram start positions (doc_id, pos) into maximal
    * spans: a run of consecutive start positions is one span of
    * run-start .. run-end + W−1 (the islands pass, partitioned by doc_id).
    */
  def coalesceSpans(positions: DataFrame, width: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    def big(c: Column): Column = c.cast("long")
    positions
      .select(col("doc_id"), col("pos"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(big(min(col("pos"))).as("span_start"),
        big(max(col("pos")) + (width - 1)).as("span_end"),
        big(max(col("pos")) + width - min(col("pos"))).as("span_tokens"))
      .select("doc_id", "span_start", "span_end", "span_tokens")
  }

  /** Maximal duplicated spans of ≥ `width` tokens over (doc_id, text).
    * Positions are 1-based token indices; span_tokens = end − start + 1.
    */
  def spans(docs: DataFrame, width: Int): DataFrame = {
    val g = grams(docs, width)
    val dup = g.groupBy(col("gh"))
      .agg(count(lit(1)).as("occ")).where(col("occ") >= 2)
    coalesceSpans(g.join(dup, "gh"), width)
  }

  /** The keep-first ordering key of an occurrence: the STRUCT
    * (doc_id, pos), compared lexicographically — an aggregate MIN over it
    * picks the globally first occurrence at any document length or id
    * range. (Earlier rounds packed the pair into one BIGINT,
    * doc_id·2^20 + pos, which silently mis-ordered once a document passed
    * 2^20 tokens or doc_ids passed 2^30 — real at the 100 TB posture this
    * operator advertises. The struct is exact; the DuckDB oracle texts keep
    * the packed BIGINT because every oracle SF is orders of magnitude
    * inside those bounds, noted at each oracle.)
    */
  private[graft] def orderKey: Column = struct(col("doc_id"), col("pos"))

  /** Keep-first scrub accounting (q263): for every duplicated W-gram the
    * globally first occurrence (MIN over the (doc_id, pos) struct — see
    * [[orderKey]]) survives; every other occurrence is redundant, and a
    * token is removed iff some redundant occurrence covers it. Returns
    * (doc_id, total_tokens, removed_tokens, kept_tokens) for every
    * document that loses at least one token.
    *
    * Scale: first-occurrence selection is an aggregate MIN per gram hash —
    * never a window over the gram partition, so a boilerplate gram with
    * 10^6 occurrences still costs one (hash, min-key) row in the shuffle.
    * The only expansion is `width` offsets per REDUNDANT occurrence.
    */
  def scrubCounts(docs: DataFrame, width: Int): DataFrame = {
    val base = docs
      .select(col("doc_id"), col("text"))
      .where(size(tokens(col("text"))) >= width)
    val g = grams(docs, width)
      .withColumn("okey", orderKey)
    val firsts = g.groupBy(col("gh"))
      .agg(count(lit(1)).as("occ"), min(col("okey")).as("first_key"))
      .where(col("occ") >= 2)
    val covered = g.join(firsts, "gh")
      .where(col("okey") =!= col("first_key"))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(width - 1))).as("o"),
        col("pos"))
      .select(col("doc_id"), (col("pos") + col("o")).as("tpos"))
      .distinct()
    base.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("total_tokens"))
      .join(covered, "doc_id")
      .groupBy(col("doc_id"), col("total_tokens"))
      .agg(count(lit(1)).as("removed_tokens"))
      .select(col("doc_id"), col("total_tokens"),
        col("removed_tokens").cast("long").as("removed_tokens"),
        (col("total_tokens") - col("removed_tokens")).cast("long").as("kept_tokens"))
  }

  /** The REWRITE itself (q266): for every document the keep-first scrub
    * touches, cut the covered tokens out and emit the cleaned text — the
    * artifact a curation pipeline actually writes back out. The covered
    * positions collapse to one per-doc cut set (collect_set — bounded by
    * the doc's own length), and the rebuild is one in-row index filter, so
    * past the q263 stages this adds only doc-sized work on AFFECTED
    * documents.
    */
  def scrubbedText(docs: DataFrame, width: Int): DataFrame = {
    val g = grams(docs, width)
      .withColumn("okey", orderKey)
    val firsts = g.groupBy(col("gh"))
      .agg(count(lit(1)).as("occ"), min(col("okey")).as("first_key"))
      .where(col("occ") >= 2)
    val flagged = g.join(firsts, "gh")
      .where(col("okey") =!= col("first_key"))
      .select(col("doc_id"), col("pos"))
    rebuildWithout(docs, flagged, width)
  }

  /** Shared rewrite stage (q266 batch, q267 streaming): given flagged gram
    * START positions (doc_id, pos), expand each to its `width` covered
    * token positions, collapse to one per-doc cut set, and rebuild the
    * text with one in-row index filter. Emits (doc_id, kept_tokens,
    * scrubbed_md5) for the documents that lose at least one token.
    */
  def rebuildWithout(docs: DataFrame, flagged: DataFrame, width: Int): DataFrame = {
    val base = docs
      .select(col("doc_id"), col("text"))
      .where(size(tokens(col("text"))) >= width)
    val cuts = flagged
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(width - 1))).as("o"), col("pos"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos") + col("o")).as("cuts"))
    base.join(cuts, "doc_id")
      .select(col("doc_id"), tokens(col("text")).as("tk"), col("cuts"))
      .select(col("doc_id"),
        expr("""filter(transform(sequence(1, size(tk)), j ->
                  IF(array_contains(cuts, j), cast(null as string), element_at(tk, j))),
                x -> x IS NOT NULL)""").as("kept"))
      .select(col("doc_id"),
        size(col("kept")).cast("long").as("kept_tokens"),
        md5(array_join(col("kept"), " ")).as("scrubbed_md5"))
  }
}
