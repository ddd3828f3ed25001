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
}
