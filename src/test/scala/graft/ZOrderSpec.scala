package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Pins the Z-order layout operator (q270's primitive): bit-interleave
  * parity against a reference implementation, the exhaustive locality law
  * on the full 64×64 grid, and the physical layout path (range-partitioned
  * z-sorted files whose per-file x/y ranges are tight on BOTH dimensions).
  */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._

  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("zval matches the reference interleave on the exhaustive 64x64 grid") {
    val got = spark.range(0, 64L * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
      .withColumn("z", ZOrder.zval(col("x"), col("y"), 6))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (x <- 0L until 64L; y <- 0L until 64L)
      assert(got((x, y)) == refZ(x, y, 6), s"zval($x, $y)")
    // bijective on the grid: 4096 distinct z-values covering 0..4095
    assert(got.values.toSet == (0L until 4096L).toSet)
  }

  test("out-of-domain keys wrap explicitly (no silent locality collapse)") {
    // zval(x + 2^bits) must equal zval(x) by the operator's own wrap — a
    // caller that forgot to bucketize gets the documented aliasing, never
    // a corrupted interleave; negative keys wrap into the domain too
    val rows = spark.range(0, 64)
      .select(col("id").as("x"), (col("id") * 7 % 64).as("y"))
      .select(
        ZOrder.zval(col("x"), col("y"), 6).as("z"),
        ZOrder.zval(col("x") + 64, col("y") + 128, 6).as("z_alias"),
        ZOrder.zval(col("x") - 64, col("y"), 6).as("z_neg"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "aliasing by +2^bits broke")
      assert(r.getLong(0) == r.getLong(2), "negative keys must wrap, not corrupt")
    }
  }

  test("locality law: an aligned 2^k x-slice touches 2^(bits-k) z-buckets, y-major touches all") {
    // x in [4, 8): aligned 4-wide slice. 64-cell z-buckets = zval >> 6,
    // whose bits are (x3, y3, x4, y4, x5, y5) — x3..x5 = 0 for this slice,
    // so exactly the 8 buckets enumerated by (y3, y4, y5) are touched.
    val touched = (for (x <- 4L until 8L; y <- 0L until 64L)
      yield refZ(x, y, 6) >> 6).toSet
    assert(touched.size == 8, s"expected 8 z-buckets, got ${touched.size}")
    // the y-major layout (bucket = y) touches all 64
    assert((for (_ <- 4L until 8L; y <- 0L until 64L) yield y).toSet.size == 64)
  }

  test("layoutByZ writes range-partitioned z-sorted files with tight 2-D ranges") {
    val out = tmpDir("zorder-layout")
    val grid = spark.range(0, 64L * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    ZOrder.layoutByZ(grid, col("x"), col("y"), bits = 6, files = 16, out)
    // content preserved
    assert(spark.read.parquet(out).count() == 4096L)
    // per-file ranges: each z-range file spans a bounded window of EACH
    // dimension (a y-sorted layout would give every file the FULL 0..63 x
    // range). Range boundaries come from sampling, so a file can straddle
    // aligned 16x16 z-tiles — allow up to 3 tiles' span, still far below
    // the full domain. input_file_name attributes rows.
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
    assert(ranges.length == 16)
    ranges.foreach { r => // row = (f, x0, x1, y0, y1)
      assert(r.getLong(2) - r.getLong(1) <= 47,
        s"file x-range too wide: ${r.getLong(1)}..${r.getLong(2)}")
      assert(r.getLong(4) - r.getLong(3) <= 47,
        s"file y-range too wide: ${r.getLong(3)}..${r.getLong(4)}")
    }
  }

  test("q277's routed layout: a second-dimension slice touches ≥4× fewer bytes than y-major (sf0.1)") {
    // the metric pin behind the declared q277 — REAL events, REAL files,
    // the q270 grid: an x-slice (the filter a y-major layout is worst at)
    // must land in a fraction of the z-layout's files while touching
    // nearly every y-major file. "Files touched" = files containing ≥1
    // matching row (what a min/max pruner must open; row groups inside
    // other files skip via the pushed filter over the stored x column).
    val dir = "/root/testdata/sf0.1"
    // the bytes-touched contrast needs sf0.1's row volume (sf0.001's ~30
    // distinct days barely populate the grid); skip, don't fail, where the
    // larger fixture was not generated
    assume(new java.io.File(dir, "events.parquet").exists(),
      s"$dir fixture not present")
    val ev = graft.model.Tables.load(spark, dir, "events")
      .withColumn("x", pmod(col("user_id"), lit(64L)))
      .withColumn("y",
        pmod(datediff(to_date(col("ts")), lit("1970-01-01").cast("date")),
          lit(64)).cast("long"))
    // 64 files ⇒ each file ≈ one 64-cell z-bucket, so the q270 locality
    // law (an aligned 4-wide x-slice touches 8 of 64 buckets) is literal
    // at the file level; range boundaries come from sampling, so allow a
    // straddle margin on the z side
    val zOut = tmpDir("zorder-sf01-z")
    val yOut = tmpDir("zorder-sf01-y")
    ZOrder.layoutByZ(ev, col("x"), col("y"), bits = 6, files = 64, zOut)
    ev.withColumn("_y", col("y"))
      .repartitionByRange(64, col("_y"))
      .sortWithinPartitions(col("_y"), col("x"))
      .drop("_y")
      .write.mode("overwrite").parquet(yOut)
    // compare BYTES TOUCHED (the actual scan bill), not file counts: the
    // two layouts materialize different file counts (range partitions with
    // no rows write no file — the y domain only spans ~30 distinct days at
    // this SF), so "N files of M" is not comparable across them, while
    // bytes-in-touched-files over bytes-total is.
    def bytes(out: String): (Long, Long) = {
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val sizes = fs.listStatus(new org.apache.hadoop.fs.Path(out))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => (st.getPath.toUri.getPath, st.getLen)).toMap
      val touched = spark.read.parquet(out)
        .filter(col("x").between(4, 7))
        .select(input_file_name().as("f")).distinct()
        .collect().map(r => new java.net.URI(r.getString(0)).getPath)
      (touched.map(sizes).sum, sizes.values.sum)
    }
    val ((zb, zt), (yb, yt)) = (bytes(zOut), bytes(yOut))
    info(f"x-slice bytes touched: zorder ${zb * 100.0 / zt}%.1f%% of $zt, " +
      f"ymajor ${yb * 100.0 / yt}%.1f%% of $yt")
    assert(yb * 10 >= yt * 9, s"y-major should scan ~every byte: $yb of $yt")
    assert(zb * 3 <= zt, s"z-order should skip most of the table: $zb of $zt")
    assert(zb * 4 <= yb, s"z-order must touch >=4x fewer bytes: z=$zb y=$yb")
    // answers identical through both layouts (the q277 slice, 2-D)
    def slice(out: String) =
      spark.read.parquet(out)
        .filter(col("x").between(4, 7) && col("y").between(8, 11))
        .groupBy(col("event_type")).count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(slice(zOut) == slice(yOut))
  }
}
