package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (SURVEY §2.2 [EXT]):
  * tokenization, shingling, portable hashing, MinHash signatures, SimHash
  * fingerprints, rolling-hash document fingerprints.
  *
  * Everything here is built from Spark's codegen'd built-ins (split / md5 /
  * higher-order array functions) — no UDFs — so the hot path stays inside
  * whole-stage codegen and the exact same computation is expressible in the
  * DuckDB oracle (md5 is bit-identical across engines, which is what makes
  * MinHash/fingerprints verifiable there).
  *
  * Hash construction: md5 hex is sliced and parsed base-16. 7 hex chars
  * (28 bits) for rolling-hash terms, 8 hex chars (32 bits) for SimHash lanes
  * — both far below 2^63 so no ANSI overflow is possible in the folds.
  */
object TextFunctions {

  /** Contract tokenizer: fixture text is single-space separated. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word-piece count via a BPE-ish regex (letters / digits / single other
    * rune), the usual pre-tokenizer shape.
    */
  def wordpieceCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Unicode NFC canonical composition (codegen'd [[NfcNormalize]]) — the
    * corpus-cleanup step that makes byte-level dedup/fingerprints robust to
    * producers emitting decomposed combining sequences.
    */
  def nfc(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      NfcNormalize(org.apache.spark.sql.GraftSqlBridge.expression(text)))

  /** Jaro-Winkler similarity (codegen'd [[JaroWinklerSimilarity]]) —
    * DuckDB-`jaro_winkler_similarity`-pinned semantics (0.7 boost
    * threshold, empty → 0). The O(len·window) fuzzy verifier for
    * LSH-proposed candidate pairs (q118).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      JaroWinklerSimilarity(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Token 3-gram shingles; documents shorter than 3 tokens degrade to a
    * single whole-text shingle. Dispatches to the codegen'd ShingleArray
    * expression — the HOF formulation (shingles3Hof) evaluates interpreted,
    * one closure + slice allocation per shingle, ~2× the signature-stage
    * cost on the dedup hot path.
    */
  def shingles3(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ShingleArray(org.apache.spark.sql.GraftSqlBridge.expression(text), distinct = false))

  /** First-occurrence-distinct shingles — fused `array_distinct(shingles3)`
    * (one hash-set pass inside the same codegen call).
    */
  def shingles3Distinct(text: Column): Column = shinglesDistinct(text, 3)

  /** Width-parametric NON-distinct token n-gram shingles (every occurrence
    * kept — the shape pair-frequency counting needs, e.g. the BPE merge
    * statistic in q81).
    */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ShingleArray(org.apache.spark.sql.GraftSqlBridge.expression(text), distinct = false, n = n))

  /** Width-parametric first-occurrence-distinct token n-gram shingles;
    * documents shorter than n tokens degrade to one whole-text shingle.
    * Width 13 is the public GPT-3/FLAN decontamination recipe.
    */
  def shinglesDistinct(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ShingleArray(org.apache.spark.sql.GraftSqlBridge.expression(text), distinct = true, n = n))

  /** HOF reference formulation of shingles3 — kept as the cross-check for
    * the codegen expression (TextFunctionsSpec pins parity).
    */
  def shingles3Hof(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i => concat_ws(" ", slice(toks, i, lit(3)))))
      .otherwise(array(text))
  }

  /** 28-bit token hash from an md5 prefix (portable across engines). */
  def tokenHash28(t: Column): Column =
    conv(substring(md5(t), 1, 7), 16, 10).cast("long")

  /** MinHash signature of k components over a shingle array: component j is
    * the lexicographic min of md5(j ':' shingle). A string-min minhash is
    * just as uniform as an integer one and needs no hex parsing.
    */
  def minhashSig(shingles: Column, k: Int): Column =
    transform(sequence(lit(1), lit(k)),
      j => array_min(transform(shingles, x => md5(concat(j.cast("string"), lit(":"), x)))))

  /** LSH band keys: hash of each `rowsPerBand`-slice of the signature.
    * Elements are rendered as strings first so numeric (BIGINT-lane) and
    * string signatures both band identically to DuckDB's
    * md5(array_to_string(slice, '|')).
    */
  def bandKeys(sig: Column, nBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)),
      b => md5(concat_ws("|",
        transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string")))))

  /** MinHash prime modulus (2^31 − 1). Lane arithmetic stays below 2^63:
    * (P−1)² · 2 + k < Long.MaxValue, so BIGINT math is overflow-free in both
    * Spark (wrapping) and DuckDB (which ERRORS on overflow).
    */
  final val MinhashP = 2147483647L
  private final val MixA = 2654435761L // Knuth multiplicative constants
  private final val MixB = 2246822519L

  /** k MinHash lane values from ONE md5 per value: the 128-bit digest is
    * split into two independent 60-bit halves x1/x2 (15 hex chars each) and
    * lane j is the universal hash (a_j·x1 + b_j·x2 + j) mod P — one digest,
    * k lanes of pure codegen'd integer arithmetic, ~k× cheaper than hashing
    * `j:value` per lane. The same construction is expressible verbatim in
    * DuckDB SQL (see DedupQueries.duckSig), keeping the oracle bit-exact.
    *
    * Returns lane columns h1..hk for the given input column.
    */
  def minhashLaneHashes(v: Column, k: Int): Seq[Column] = {
    val m = md5(v)
    val x1 = ColumnOps.hexLong(m, 1, 15) % MinhashP
    val x2 = ColumnOps.hexLong(m, 17, 15) % MinhashP
    (1 to k).map { j =>
      val aj = (j * MixA) % MinhashP
      val bj = (j * MixB) % MinhashP
      ((lit(aj) * x1 + lit(bj) * x2 + lit(j.toLong)) % MinhashP).as(s"h$j")
    }
  }

  /** Estimated Jaccard from two equal-length signatures: matching fraction. */
  def sigMatchCount(a: Column, b: Column, k: Int): Column =
    aggregate(
      transform(sequence(lit(1), lit(k)),
        i => when(element_at(a, i) === element_at(b, i), 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)

  /** 32-bit SimHash over the distinct-token set. Built with expr() because
    * the SQL shiftright/shiftleft accept a column shift amount where the
    * Scala wrappers take only a literal Int.
    */
  def simhash32(textCol: String): Column = expr(
    s"""aggregate(sequence(0, 31), cast(0 as bigint), (acc, b) -> acc + IF(
       |  aggregate(
       |    transform(array_distinct(split($textCol, ' ')),
       |              t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)),
       |    cast(0 as bigint),
       |    (a, h) -> a + (shiftright(h, b) % 2) * 2 - 1) >= 0,
       |  shiftleft(cast(1 as bigint), b), cast(0 as bigint)))""".stripMargin)

  /** Order-sensitive polynomial rolling hash of the token stream,
    * h := (h*31 + hash28(tok)) mod 1e9+7 — a document fingerprint that, unlike
    * md5(text), survives re-serialization of the token stream.
    */
  def rollingFingerprint(textCol: String): Column = expr(
    s"""aggregate(split($textCol, ' '), cast(0 as bigint),
       |  (h, t) -> (h * 31 + cast(conv(substring(md5(t), 1, 7), 16, 10) as bigint)) % 1000000007)""".stripMargin)

  /** Hamming distance between two simhash fingerprints (≤64 bits). */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")
}
