package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.VersionedView

/** Write-audit-publish durability pins for the merge-view sink: latest-row
  * merge semantics, replay idempotency, crash-window safety (the previous
  * version stays live until the new one is fully published), and
  * concurrent-reader retention.
  */
class VersionedViewSpec extends AnyFunSuite {
  import TestSpark._

  private def df(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "n")
  }

  test("merge semantics: later batches replace same-key rows, union new keys") {
    val out = tmpDir("vview-merge")
    val sink = VersionedView.mergeSink(out, Seq("k"))
    sink(df("a" -> 1L, "b" -> 2L), 0L)
    sink(df("b" -> 20L, "c" -> 3L), 1L)
    val got = VersionedView.read(spark, out).get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 20L, "c" -> 3L))
    assert(VersionedView.currentVersion(spark, out).contains("v=1"))
  }

  test("replay idempotency: re-running a published batch is a no-op") {
    val out = tmpDir("vview-replay")
    val sink = VersionedView.mergeSink(out, Seq("k"))
    sink(df("a" -> 1L), 0L)
    sink(df("b" -> 2L), 1L)
    val before = VersionedView.read(spark, out).get.collect().toSet
    sink(df("b" -> 2L), 1L) // at-least-once foreachBatch replay
    assert(VersionedView.currentVersion(spark, out).contains("v=1"))
    assert(VersionedView.read(spark, out).get.collect().toSet == before)
  }

  test("crash mid-publish: stale unpublished version dir is rebuilt, view never lost") {
    val out = tmpDir("vview-crash")
    val sink = VersionedView.mergeSink(out, Seq("k"))
    sink(df("a" -> 1L), 0L)
    // simulate a crash AFTER the v=1 dir rename but BEFORE the pointer
    // swap: a complete-looking v=1 exists, _CURRENT still says v=0
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    df("junk" -> 99L).write.parquet(s"$out/v=1")
    assert(VersionedView.currentVersion(spark, out).contains("v=0"))
    // the reader BEFORE recovery still sees the last published version
    assert(VersionedView.read(spark, out).get.collect().toSet
      == df("a" -> 1L).collect().toSet)
    // replaying batch 1 tears the stale dir down and publishes correctly
    sink(df("b" -> 2L), 1L)
    assert(VersionedView.currentVersion(spark, out).contains("v=1"))
    val got = VersionedView.read(spark, out).get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 2L))
    assert(!fs.exists(new Path(out, "v=1/junk")))
  }

  test("time travel: retained snapshots readable by name, expired ones refuse") {
    val out = tmpDir("vview-travel")
    val sink = VersionedView.mergeSink(out, Seq("k"))
    sink(df("a" -> 1L), 0L)
    sink(df("b" -> 2L), 1L)
    assert(VersionedView.versions(spark, out) == Seq("v=0", "v=1"))
    // the OLD snapshot still reads exactly as published (immutable dirs)
    assert(VersionedView.readVersion(spark, out, "v=0")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 1L))
    sink(df("c" -> 3L), 2L) // v=0 retention-dropped
    assert(VersionedView.versions(spark, out) == Seq("v=1", "v=2"))
    intercept[IllegalArgumentException] {
      VersionedView.readVersion(spark, out, "v=0")
    }
  }

  test("retention: previous version stays readable through the next publish") {
    val out = tmpDir("vview-retain")
    val sink = VersionedView.mergeSink(out, Seq("k"))
    sink(df("a" -> 1L), 0L)
    // an in-flight reader resolves v=0 ...
    val pinned = s"$out/v=0"
    sink(df("b" -> 2L), 1L) // publish v=1: v=0 must be retained
    assert(spark.read.parquet(pinned).count() == 1)
    sink(df("c" -> 3L), 2L) // publish v=2: v=0 is now two behind — dropped
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(pinned)))
    assert(fs.exists(new Path(out, "v=1")))
    assert(fs.exists(new Path(out, "v=2")))
  }

  test("audit: a partial write can never publish (previous version stays live)") {
    val out = tmpDir("vview-audit")
    val sink = VersionedView.mergeSink(out, Seq("k"))
    sink(df("a" -> 1L), 0L)
    // a batch whose WRITE fails (unwritable column type for parquet? use a
    // deliberately failing plan: division via UDF that throws)
    val bad = df("b" -> 2L).withColumn("boom",
      udf((n: Long) => { throw new RuntimeException("torn write"); n }: Long)
        .apply(col("n")))
    intercept[Exception] { sink(bad, 1L) }
    // nothing published, pointer untouched, view intact
    assert(VersionedView.currentVersion(spark, out).contains("v=0"))
    assert(VersionedView.read(spark, out).get.collect().toSet
      == df("a" -> 1L).collect().toSet)
  }

  private def cdc(rows: (Long, Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("k", "ord", "v", "op")
  }

  private def state(out: String) =
    VersionedView.readState(spark, out, "op").get
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap

  test("cdc apply: conditional latest-wins with tombstones, out-of-order safe") {
    val out = tmpDir("vview-cdc")
    val sink = VersionedView.cdcSink(out, Seq("k"), Seq("ord"))
    // batch 0 carries the NEWEST changes; batch 1 arrives later with STALE ones
    sink(cdc((1L, 10L, "new", "U"), (2L, 10L, "del", "D"), (3L, 5L, "x", "U")), 0L)
    assert(state(out) == Map(1L -> "new", 3L -> "x")) // tombstone hidden
    sink(cdc(
      (1L, 3L, "stale", "U"),  // older than the applied v=10 — must NOT win
      (2L, 4L, "stale", "U"),  // older than the tombstone — must NOT resurrect
      (3L, 9L, "y", "U"),      // newer — must win
      (4L, 1L, "z", "U")), 1L) // unseen key — must insert
    assert(state(out) == Map(1L -> "new", 3L -> "y", 4L -> "z"))
    // a newer delete beats live state; a newer update beats a tombstone
    sink(cdc((3L, 20L, "gone", "D"), (2L, 30L, "back", "U")), 2L)
    assert(state(out) == Map(1L -> "new", 2L -> "back", 4L -> "z"))
  }

  test("retract agg: updates retract, deletes retract, stale changes add nothing") {
    import spark.implicits._
    val (st, agg) = (tmpDir("vview-rstate"), tmpDir("vview-ragg"))
    def ch(rows: (Long, Long, Long, String)*) =
      rows.toDF("k", "ord", "v", "op")
    val sink = VersionedView.retractAggSink(st, agg, Seq("k"), Seq("ord"),
      "op", groupCol = col("k") % 2, valueMicro = col("v"))
    def snap() = VersionedView.readAgg(spark, agg).get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // groups: even keys -> g=0, odd -> g=1
    sink(ch((1L, 1L, 100L, "U"), (2L, 1L, 10L, "U"), (3L, 1L, 5L, "U")), 0L)
    assert(snap() == Set((0L, 1L, 10L), (1L, 2L, 105L)))
    sink(ch(
      (1L, 5L, 200L, "U"),   // update: retract 100, add 200
      (2L, 5L, 0L, "D"),     // delete: retract 10, group 0 drains -> hidden
      (3L, 0L, 999L, "U")),  // STALE: contributes nothing
      1L)
    assert(snap() == Set((1L, 2L, 205L)))
    // replay of batch 1 is a no-op on both views
    sink(ch((1L, 5L, 200L, "U"), (2L, 5L, 0L, "D"), (3L, 0L, 999L, "U")), 1L)
    assert(snap() == Set((1L, 2L, 205L)))
    // resurrect key 2 with a newer update: group 0 reappears
    sink(ch((2L, 9L, 42L, "U")), 2L)
    assert(snap() == Set((0L, 1L, 42L), (1L, 2L, 205L)))
  }

  test("retract min/max: deleting the minimum surfaces the runner-up") {
    import spark.implicits._
    val (st, idx) = (tmpDir("vview-mstate"), tmpDir("vview-midx"))
    def ch(rows: (Long, Long, Long, String)*) = rows.toDF("k", "ord", "v", "op")
    val sink = VersionedView.retractMinMaxSink(st, idx, Seq("k"), Seq("ord"),
      "op", groupCol = lit(0L), valueMicro = col("v"))
    def snap() = VersionedView.readMinMax(spark, idx).get
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toList
    sink(ch((1L, 1L, 5L, "U"), (2L, 1L, 7L, "U"), (3L, 1L, 9L, "U")), 0L)
    assert(snap() == List((3L, 5L, 9L)))
    // delete the min holder: the non-invertible case — runner-up must surface
    sink(ch((1L, 2L, 0L, "D")), 1L)
    assert(snap() == List((2L, 7L, 9L)))
    // update the max holder DOWNWARD: old max retracts, new max is the old mid
    sink(ch((3L, 5L, 6L, "U")), 2L)
    assert(snap() == List((2L, 6L, 7L)))
    // duplicate values: retracting one of two equal minima keeps the min
    sink(ch((4L, 1L, 6L, "U")), 3L)
    assert(snap() == List((3L, 6L, 7L)))
    sink(ch((3L, 9L, 0L, "D")), 4L)
    assert(snap() == List((2L, 6L, 7L)))
  }

  test("running median tracks retractions, lower-median on even counts") {
    import spark.implicits._
    val (st, idx) = (tmpDir("vview-medstate"), tmpDir("vview-medidx"))
    def ch(rows: (Long, Long, Long, String)*) = rows.toDF("k", "ord", "v", "op")
    val sink = VersionedView.retractMinMaxSink(st, idx, Seq("k"), Seq("ord"),
      "op", groupCol = lit(0L), valueMicro = col("v"))
    def med() = VersionedView.readMedian(spark, idx).get
      .collect().map(r => (r.getLong(1), r.getLong(2))).toList // (median, n)
    sink(ch((1L, 1L, 10L, "U"), (2L, 1L, 20L, "U"), (3L, 1L, 30L, "U")), 0L)
    assert(med() == List((20L, 3L)))
    // even count: LOWER median (2*cum >= n picks position n/2)
    sink(ch((4L, 1L, 40L, "U")), 1L)
    assert(med() == List((20L, 4L)))
    // delete the median holder: median moves without any stream rescan
    sink(ch((2L, 5L, 0L, "D")), 2L)
    assert(med() == List((30L, 3L)))
  }

  test("cdc apply reduces each batch to its own latest change per key") {
    val out = tmpDir("vview-cdc2")
    val sink = VersionedView.cdcSink(out, Seq("k"), Seq("ord"))
    sink(cdc((1L, 1L, "a", "U"), (1L, 3L, "c", "U"), (1L, 2L, "b", "U")), 0L)
    assert(state(out) == Map(1L -> "c"))
    // replay of a published batch is a no-op
    sink(cdc((1L, 99L, "ghost", "U")), 0L)
    assert(state(out) == Map(1L -> "c"))
  }
}
