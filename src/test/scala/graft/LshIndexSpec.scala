package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LshIndex

/** Pins the streaming LSH near-dup index (q236's operator): incremental
  * batch-by-batch emission equals the one-shot batch pair set, and a
  * replayed batch (foreachBatch at-least-once) changes nothing.
  */
class LshIndexSpec extends AnyFunSuite {
  import TestSpark._

  // near-dup trio (a/b high-overlap, c disjoint), plus an exact dup pair
  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different content with no shared shingles at all"),
      (4L, "the quick brown fox jumps over the lazy dog today"),
      (5L, "yet another unrelated document about spark partitioning tricks"))
      .toDF("doc_id", "text")
  }

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "est_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSet

  test("incremental emission over batches equals the one-shot batch pairs") {
    val all = docs
    val oneShot = pairSet(LshIndex.pairsBetween(
      LshIndex.banded(LshIndex.signatures(all)),
      LshIndex.banded(LshIndex.signatures(all))))
    assert(oneShot.exists(p => p._1 == 1L && p._2 == 4L), "exact dup pair expected")

    val (store, pairs) = (tmp("lsh-store"), tmp("lsh-pairs"))
    // three arrival orders' worth of batches: {1,3}, {2,5}, {4}
    LshIndex.processBatch(all.filter(col("doc_id").isin(1L, 3L)), store, pairs, 0L)
    LshIndex.processBatch(all.filter(col("doc_id").isin(2L, 5L)), store, pairs, 1L)
    LshIndex.processBatch(all.filter(col("doc_id") === 4L), store, pairs, 2L)
    val streamed = pairSet(graft.streaming.Loader.readTable(spark, pairs))
    assert(streamed == oneShot)
    // each pair emitted exactly once (no cross-batch duplicates)
    val n = graft.streaming.Loader.readTable(spark, pairs).count()
    assert(n == oneShot.size.toLong)
  }

  test("replayed batch is idempotent: same pairs, no duplicate signatures") {
    val all = docs
    val (store, pairs) = (tmp("lsh-store2"), tmp("lsh-pairs2"))
    val mk = tmp("lsh-markers")
    LshIndex.processBatch(all.filter(col("doc_id").isin(1L, 3L)), store, pairs, 0L, mk)
    LshIndex.processBatch(all.filter(col("doc_id").isin(2L, 4L, 5L)), store, pairs, 1L, mk)
    val before = pairSet(graft.streaming.Loader.readTable(spark, pairs))
    val sigsBefore = spark.read.parquet(store).count()
    // at-least-once replay of batch 1: marker skips the pair write, the
    // anti-join drops every already-stored signature
    LshIndex.processBatch(all.filter(col("doc_id").isin(2L, 4L, 5L)), store, pairs, 1L, mk)
    assert(pairSet(graft.streaming.Loader.readTable(spark, pairs)) == before)
    assert(spark.read.parquet(store).count() == sigsBefore)
    assert(spark.read.parquet(store).select("doc_id").distinct().count() == 5L)
  }

  test("per-batch work stays flat as the store grows (bucketed store, no re-shuffle)") {
    import spark.implicits._
    // distinct long-ish texts so every doc signs and bands; id-salted words
    // keep cross-doc shingle overlap (and thus pair volume) negligible
    def mkDocs(from: Long, until: Long) =
      spark.range(from, until).select(col("id").as("doc_id"),
        concat_ws(" ", (0 to 11).map(i =>
          concat(lit(s"w$i"), (col("id") * 31 + i) % 9973)): _*).as("text"))
    val (store, pairs) = (tmp("lsh-grow-store"), tmp("lsh-grow-pairs"))
    // seed the store large, then measure two identical tiny batches with
    // the store 2x apart in size. The store side of the probe join is
    // bucketed on the join keys, so it contributes ZERO shuffle records —
    // per-batch volume is the batch's own signing/banding/self-join. The
    // pre-bucketing layout re-banded and re-shuffled the WHOLE store per
    // batch: rSmall/rBig would differ by ~storeDelta x BANDS records and
    // both would carry the corpus-sized store term.
    LshIndex.processBatch(mkDocs(0L, 600L), store, pairs, 0L)
    val rSmall = shuffleRecordsDuring {
      LshIndex.processBatch(mkDocs(10000L, 10005L), store, pairs, 1L)
    }
    LshIndex.processBatch(mkDocs(600L, 1200L), store, pairs, 2L)
    val rBig = shuffleRecordsDuring {
      LshIndex.processBatch(mkDocs(20000L, 20005L), store, pairs, 3L)
    }
    info(s"tiny-batch shuffle records: store@600 -> $rSmall, store@1200 -> $rBig")
    // flat growth law: the doubled store must not add ~600x4=2400 records
    // (the old re-shuffle term); allow slack for AQE/stat jitter
    assert(rSmall > 0 && rBig > 0, s"expected work on both batches ($rSmall, $rBig)")
    assert(rBig <= rSmall + 400,
      s"per-batch shuffle grew with the store: $rSmall -> $rBig — store-side re-shuffle is back?")
  }

  test("decontaminate probe work is flat in benchmark-index size") {
    import spark.implicits._
    def mkDocs(from: Long, until: Long) =
      spark.range(from, until).select(col("id").as("doc_id"),
        concat_ws(" ", (0 to 11).map(i =>
          concat(lit(s"w$i"), (col("id") * 31 + i) % 9973)): _*).as("text"))
    def probeRecords(indexDocs: Long): Long = {
      val (idx, hits) = (tmp("lsh-dc-idx"), tmp("lsh-dc-hits"))
      LshIndex.buildStaticIndex(mkDocs(0L, indexDocs), idx)
      shuffleRecordsDuring {
        LshIndex.decontaminateSink(idx, hits)(mkDocs(50000L, 50005L), 0L)
      }
    }
    val (small, big) = (probeRecords(500L), probeRecords(1500L))
    info(s"probe shuffle records: index@500 -> $small, index@1500 -> $big")
    // the index side of the probe join is bucketed on the join keys: a
    // 3x index must not add its banded rows (1000x4=4000) to the batch's
    // shuffle; the sink is stateless so the only records are the batch's
    // own signing/banding
    assert(small >= 0 && big >= 0)
    assert(big <= small + 400,
      s"probe work grew with the index: $small -> $big — index-side re-shuffle?")
  }
}
