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
  * of the matching band buckets. The signature store is a BUCKETED table
  * on the probe join's keys (band_idx, band) — the `bucketBy` pattern
  * `AnnIvf.buildIndex` uses — so the store side of every batch's probe
  * join plans with ZERO exchange: the store's corpus-sized banded rows
  * never cross the network again after their one bucketed write; only the
  * batch side (batch-sized) shuffles, to the bucket count.
  * LshIndexSpec pins this as a growth law: per-batch shuffle records stay
  * flat as the store accumulates (the pre-bucketing shape re-shuffled the
  * WHOLE store every micro-batch — per-batch cost grew linearly with
  * corpus history, the classic streaming-index scale killer). The
  * remaining per-batch store cost is the bucket scan + merge-join sort,
  * local CPU/IO that a deployment prunes further by compacting buckets.
  */
object LshIndex {

  import DedupQueries.{BANDS, K, ROWS}

  /** Bucket count of the signature store table. Fixed at table creation;
    * a deployment sizes it to the executor count (it bounds probe-side
    * shuffle width), the gate keeps it aligned with the 8-partition
    * streaming harness.
    */
  val StoreBuckets = 8

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
    // is anti-joined against the stored doc_ids before any pair is
    // generated, so the stored signature stays authoritative and the
    // emitted pairs can never disagree with the store about which
    // signature a doc_id carries. First arrival wins; a changed text for
    // an existing doc_id is discarded (insert-only index contract).
    // The id set is its own SIDECAR table bucketed BY doc_id: anti-joining
    // against the banded store (bucketed on the band keys) would re-shuffle
    // store-sized doc_id rows every batch — the growth term LshIndexSpec's
    // flat-work law caught when this was a distinct() over the main store.
    val bban = bbanAll
      .join(storedIds(spark, storeDir, storeBan), Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      bban.count() // materialize once; probed up to twice below
      val pairs = pairsBetween(bban, bban, threshold)
        .unionByName(pairsBetween(bban, storeBan, threshold))
        .dropDuplicates("id_a", "id_b")
      Loader.writeBatchIdempotent(pairs, pairsDir, batchId, markersDir)
      // The store keeps BANDED rows (doc_id, sig, band_idx, band), one per
      // (doc, band), appended into the bucketed table: 4× the rows of the
      // old one-row-per-doc layout, bought back many times over because
      // the probe join's store side never shuffles again (the old layout
      // re-banded AND re-shuffled the whole store every batch).
      val fresh = bban.dropDuplicates("doc_id", "band_idx")
        .select(col("doc_id"), col("sig"), col("band_idx"), col("band"))
      fresh.write.mode("append").format("parquet")
        .bucketBy(StoreBuckets, "band_idx", "band")
        .option("path", storeDir)
        .saveAsTable(storeTable(storeDir))
      // id sidecar (batch-sized write): keeps the NEXT batch's re-arrival
      // anti-join exchange-free on the store side
      bban.select(col("doc_id")).dropDuplicates("doc_id")
        .write.mode("append").format("parquet")
        .bucketBy(StoreBuckets, "doc_id")
        .option("path", idsDir(storeDir))
        .saveAsTable(storeTable(storeDir) + "_ids")
    } finally bban.unpersist()
  }

  private def idsDir(storeDir: String): String =
    storeDir.stripSuffix("/") + "_ids"

  /** The stored doc_id set for the re-arrival anti-join — the bucketed id
    * sidecar when present; derived from the banded rows otherwise (one
    * store-sized pass, only ever on a legacy/foreign store dir).
    */
  private def storedIds(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, storeBan: DataFrame): DataFrame = {
    val tbl = storeTable(storeDir) + "_ids"
    if (spark.catalog.tableExists(tbl)) spark.table(tbl)
    else {
      val p = new org.apache.hadoop.fs.Path(idsDir(storeDir))
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
        spark.read.parquet(idsDir(storeDir))
      else storeBan.select(col("doc_id")).dropDuplicates("doc_id")
    }
  }

  /** Catalog name of the bucketed store table for a given dir — derived
    * from the path so concurrent harnesses (distinct scratch dirs) never
    * collide. The catalog entry is session-lifetime (in-memory catalog);
    * the DATA lives under `storeDir` like every other harness artifact.
    */
  def storeTable(storeDir: String): String =
    "lsh_store_" + org.apache.commons.codec.digest.DigestUtils
      .md5Hex(storeDir).take(16)

  private def storeOrEmpty(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, like: DataFrame): DataFrame = {
    val tbl = storeTable(storeDir)
    if (spark.catalog.tableExists(tbl)) spark.table(tbl)
    else {
      // a NEW session over an existing store dir (catalog entries are
      // session-lifetime): the banded rows read back fine as plain
      // parquet — correct, merely without the exchange-free layout until
      // the next append re-registers the table
      val p = new org.apache.hadoop.fs.Path(storeDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
        spark.read.parquet(storeDir)
      else like.limit(0)
    }
  }

  /** `foreachBatch` sink closing over the three dirs — plug straight into
    * `docs.writeStream.foreachBatch(LshIndex.nearDupSink(...))`.
    */
  def nearDupSink(storeDir: String, pairsDir: String, markersDir: String = null,
      threshold: Double = 0.5): (DataFrame, Long) => Unit =
    (batch, id) => processBatch(batch, storeDir, pairsDir, id, markersDir, threshold)

  /** Build a STATIC banded signature index over a bounded document set —
    * the same bucketed layout the streaming store uses, for PROBE-ONLY
    * consumers (q253's benchmark set): every later probe join reads the
    * index exchange-free, and the index is written exactly once.
    */
  def buildStaticIndex(docs: DataFrame, dir: String): Unit =
    banded(signatures(docs.select("doc_id", "text")))
      .write.mode("overwrite").format("parquet")
      .bucketBy(StoreBuckets, "band_idx", "band")
      .option("path", dir)
      .saveAsTable(storeTable(dir))

  /** STREAMING DECONTAMINATION sink: probe each micro-batch of corpus
    * documents against a static benchmark index ([[buildStaticIndex]]) and
    * emit (doc_id, bench_id, est_jaccard ≥ threshold) hits idempotently —
    * the ingest-time twin of the batch decontamination operator
    * (operators/Decontaminate, q61): a contaminated document is flagged
    * the moment it arrives instead of at the next corpus sweep.
    *
    * Orientation is preserved (probe doc → benchmark doc), unlike
    * [[pairsBetween]]'s id-normalized pairs: the consumer drops/quarantines
    * the CORPUS side, never the benchmark. Stateless per batch — no store
    * append — so replay safety is the pair write's marker protocol alone.
    *
    * 100 TB shape: per-batch cost is the batch's signing + one probe join
    * whose index side never shuffles (bucketed on the join keys); the
    * benchmark index is built once per benchmark revision.
    */
  def decontaminateSink(indexDir: String, hitsDir: String,
      markersDir: String = null, threshold: Double = 0.5)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    val bban = banded(signatures(batch.select("doc_id", "text")))
    val idx = storeOrEmpty(spark, indexDir, bban)
    val hits = bban
      .select(col("band_idx"), col("band"),
        col("doc_id").as("did"), col("sig").as("sig_p"))
      .join(idx.select(col("band_idx"), col("band"),
        col("doc_id").as("bid"), col("sig").as("sig_i")), Seq("band_idx", "band"))
      .filter(col("did") =!= col("bid"))
      .select(col("did").as("doc_id"), col("bid").as("bench_id"),
        Protocol.out6(Protocol.dec(sigMatchCount(col("sig_p"), col("sig_i"), K)) / K)
          .as("est_jaccard"))
      .dropDuplicates("doc_id", "bench_id")
      .filter(col("est_jaccard") >= threshold)
    Loader.writeBatchIdempotent(hits, hitsDir, batchId, markersDir)
  }
}
