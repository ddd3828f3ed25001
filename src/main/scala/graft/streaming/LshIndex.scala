package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{bandKeys, minhashLaneHashes, shingles3Distinct, sigMatchCount}
import graft.queries.{DedupQueries, Protocol}

/** STREAMING MinHash-LSH near-duplicate index — the incremental twin of the
  * batch `SharedStages.minhashSigs`/`lshPairs` stages, closing the gap
  * `Stateful.curateStream` documents ("the near-dup stage intentionally
  * stays batch-side"): here it doesn't. Each micro-batch of documents is
  * signed, banded, probed against everything seen so far, and appended to a
  * persistent signature store — so near-dup PAIRS stream out with bounded
  * per-batch cost instead of waiting for a periodic corpus compaction.
  *
  * Semantics (the q236 gate pins this against the batch oracle): a pair
  * (a, b) with a < b is emitted exactly once, by the micro-batch that
  * completes it — batch×batch if both arrive together, batch×store if the
  * later one arrives after the earlier was indexed. The union over all
  * batches therefore equals the BATCH `lshPairs` output bit-for-bit (same
  * md5-derived lanes, same 4×4 banding, same est ≥ threshold filter).
  *
  * Failure model mirrors `AnnIvf.maintainIndexStream`: foreachBatch is
  * at-least-once, so both sides of the batch are made idempotent — pairs go
  * through `Loader.writeBatchIdempotent` (dynamic `_batch` partition
  * overwrite + commit marker), signatures append through a left-anti join
  * on doc_id against the store. A replayed batch rewrites its own pair
  * partition and its already-stored signatures anti-join away. Pairs are
  * written BEFORE signatures: a crash between the two replays into a store
  * that may already hold the batch's docs, which only shifts pairs from the
  * batch×batch branch to the batch×store branch — the de-duplicated union
  * is identical.
  *
  * 100 TB shape: candidate generation is the banded equi-join — never
  * all-pairs — and per-batch cost is the batch's own signing plus one probe
  * of the matching band buckets. The store re-read here is a plain parquet
  * dir (right for the bounded-replay gate); a deployment at corpus scale
  * stores the banded signatures as a table bucketed by (band_idx, band) —
  * exactly the `bucketBy` pattern `AnnIvf.buildIndex` uses — so the
  * store-side shuffle of the probe join disappears and each batch touches
  * only the buckets its own bands hash to.
  */
object LshIndex {

  import DedupQueries.{BANDS, K, ROWS}

  /** (doc_id, sig: array<bigint>) 16-lane MinHash signatures for an
    * arbitrary (doc_id, text) frame — the DataFrame-in form of
    * `SharedStages.minhashSigs` (which is dir-keyed and materialized; a
    * micro-batch is neither). Lane hashes are per shingle occurrence so the
    * min aggregates partially map-side.
    */
  def signatures(docs: DataFrame): DataFrame = {
    val laned = docs
      .select(col("doc_id"), explode(shingles3Distinct(col("text"))).as("sh"))
      .select(col("doc_id") +: minhashLaneHashes(col("sh"), K): _*)
    val comps = (1 to K).map(j => min(col(s"h$j")).as(s"m$j"))
    laned.groupBy(col("doc_id"))
      .agg(comps.head, comps.tail: _*)
      .select(col("doc_id"), array((1 to K).map(j => col(s"m$j")): _*).as("sig"))
  }

  /** (doc_id, sig, band_idx, band): one row per LSH band. */
  def banded(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("sig"),
      posexplode(bandKeys(col("sig"), BANDS, ROWS)).as(Seq("band_idx", "band")))

  /** Near-dup pairs between two banded sides: equi-join on (band_idx, band),
    * id-ordered (id_a < id_b), signature-agreement estimate ≥ `threshold`.
    * Self-pairs drop; a pair colliding in several bands (or found by both a
    * batch×batch and a batch×store probe of a replayed batch) dedups on the
    * ordered id pair. est_jaccard is symmetric, so the sig column order
    * never matters.
    */
  def pairsBetween(probe: DataFrame, index: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val a = probe.select(col("band_idx"), col("band"),
      col("doc_id").as("id_p"), col("sig").as("sig_p"))
    val b = index.select(col("band_idx"), col("band"),
      col("doc_id").as("id_i"), col("sig").as("sig_i"))
    a.join(b, Seq("band_idx", "band"))
      .filter(col("id_p") =!= col("id_i"))
      .select(
        least(col("id_p"), col("id_i")).as("id_a"),
        greatest(col("id_p"), col("id_i")).as("id_b"),
        Protocol.out6(Protocol.dec(sigMatchCount(col("sig_p"), col("sig_i"), K)) / K)
          .as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("est_jaccard") >= threshold)
  }

  /** One micro-batch against the index: emit every pair this batch
    * completes into `pairsDir`, then append the batch's signatures to
    * `storeDir`. Idempotent on replay (see object doc). `markersDir`
    * follows `writeBatchIdempotent`'s contract — tie it to the CHECKPOINT
    * so a checkpoint reset also resets the pair commit markers.
    */
  def processBatch(batch: DataFrame, storeDir: String, pairsDir: String,
      batchId: Long, markersDir: String = null,
      threshold: Double = 0.5): Unit = {
    val spark = batch.sparkSession
    val bbanAll = banded(signatures(batch.select("doc_id", "text")))
    val storeBan = storeOrEmpty(spark, storeDir, bbanAll)
    // Re-arrivals (a doc_id already in the store arriving again in a LATER
    // batch, not just a replay) are no-ops BY CONSTRUCTION: the probe side
    // is anti-joined against the store by doc_id before any pair is
    // generated, so the stored signature stays authoritative and the
    // emitted pairs can never disagree with the store about which
    // signature a doc_id carries. First arrival wins; a changed text for
    // an existing doc_id is discarded (insert-only index contract).
    val bban = bbanAll
      .join(storeBan.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      bban.count() // materialize once; probed up to twice below
      val pairs = pairsBetween(bban, bban, threshold)
        .unionByName(pairsBetween(bban, storeBan, threshold))
        .dropDuplicates("id_a", "id_b")
      Loader.writeBatchIdempotent(pairs, pairsDir, batchId, markersDir)
      val fresh = bban.dropDuplicates("doc_id") // re-band on read, store one row per doc
        .select(col("doc_id"), col("sig"))
      fresh.write.mode("append").parquet(storeDir)
    } finally bban.unpersist()
  }

  private def storeOrEmpty(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, like: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      banded(spark.read.parquet(storeDir))
    else like.limit(0)
  }

  /** `foreachBatch` sink closing over the three dirs — plug straight into
    * `docs.writeStream.foreachBatch(LshIndex.nearDupSink(...))`.
    */
  def nearDupSink(storeDir: String, pairsDir: String, markersDir: String = null,
      threshold: Double = 0.5): (DataFrame, Long) => Unit =
    (batch, id) => processBatch(batch, storeDir, pairsDir, id, markersDir, threshold)
}
