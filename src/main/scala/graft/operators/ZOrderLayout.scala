package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) DATA LAYOUT — multi-dimensional clustering for
  * scan pruning, the storage-side half of "make the 100 TB scan cheap".
  *
  * A table range-partitioned and sorted by the interleaved-bit key of two
  * dimensions puts every output file over a small RECTANGLE of (dimA, dimB)
  * space, so parquet min/max stats on BOTH original columns are tight and a
  * predicate box on either (or both) dimensions skips most files/row-groups
  * — where a single-column sort gives tight stats on that column only and
  * random placement in every other. (The reference system has no layout
  * control at all: Aurora's clustered PK is its only order — this is the
  * Spark-native generalization, same idea as Delta/Iceberg OPTIMIZE ZORDER.)
  *
  * The key is pure shift/mask arithmetic over the low 16 bits of each
  * dimension (codegen'd builtins end-to-end, engine-portable: the DuckDB
  * oracle reproduces it with `<<`/`&`). 16+16 bits = one positive int key;
  * callers quantize real dimensions (ids, day numbers, buckets of a
  * continuous value) into [0, 65536) first — coarse quantization is fine,
  * the curve only needs enough resolution to separate files.
  */
object ZOrderLayout {

  /** Spread the low 16 bits of `v` to even bit positions (Morton half):
    * 0000abcd → 0a0b0c0d (generalized). Masks are the classic magic
    * numbers; input is masked to 16 bits first so any quantization slip
    * degrades locality, never correctness.
    */
  def spread16(v: Column): Column = {
    val x0 = v.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Interleaved z-key of two 16-bit quantized dimensions (a in even bits,
    * b in odd bits): adjacent keys are adjacent in BOTH dimensions.
    */
  def zKey2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Reference implementation for specs (bit-for-bit twin of spread16). */
  private[graft] def zKey2Ref(a: Long, b: Long): Long = {
    def spread(v: Long): Long = {
      var x = v & 0xFFFFL
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      (x | (x << 1)) & 0x55555555L
    }
    spread(a) | (spread(b) << 1)
  }

  /** Rewrite `df` into `out` as `files` parquet files clustered on the
    * z-curve of the two quantized dimensions: ONE range shuffle on the key
    * (range bounds = curve segments = spatial rectangles), an in-partition
    * sort so row-groups inside each file are tight too, and the scratch key
    * is dropped before the write. At 100 TB this is the compaction /
    * OPTIMIZE job shape: layout cost is paid once per corpus version,
    * every subsequent dimensional scan benefits.
    */
  def writeClustered(df: DataFrame, dimA: Column, dimB: Column, out: String,
      files: Int): Unit = {
    df.withColumn("_zkey", zKey2(dimA, dimB))
      .repartitionByRange(files, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(out)
  }
}
