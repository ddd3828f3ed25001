package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join (SURVEY §2.2 [EXT], §7.3): pair rows whose timestamps
  * fall within a bounded interval of each other, per key.
  *
  * A naive `a.join(b, a.key === b.key && b.ts.between(a.ts - w, a.ts))` gives
  * Catalyst only the key as an equi-component; with high-cardinality keys
  * that is fine, but with few keys each key-group degenerates to an O(n·m)
  * nested loop inside one task. Bucketing by `floor(ts / window)` adds a
  * second equi-component: each left row is exploded to the (at most
  * ceil(window/bucket)+1 = 2) buckets its interval can touch, the join runs
  * hash/sort-merge on (key, bucket), and the residual range predicate only
  * filters within same-bucket candidates. Row amplification is exactly 2×
  * on the left side — constant, scale-independent.
  *
  * `windowMicros` is both the range width (left.ts - window <= right.ts <=
  * left.ts) and the bucket size.
  */
object RangeJoin {

  /** Inner join only: the left side is exploded to 2 bucket rows before the
    * join, so any outer type would emit spurious null-padded duplicates. For
    * zero-preserving semantics, left-join the inner result back to `left` on
    * its row id (the q37 pattern in JoinOpQueries).
    */
  def backwardWindow(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, windowMicros: Long): DataFrame = {
    val lUs = unix_micros(col(s"l.$tsCol"))
    val rUs = unix_micros(col(s"r.$tsCol"))

    // True floor division in pure long arithmetic (ColumnOps.floorDiv):
    // exact even for pre-epoch (negative) timestamps. Column./ would be
    // DOUBLE division — a rounded double then truncated can flip a boundary
    // bucket and silently miss pairs.
    def bucket(c: Column): Column =
      graft.functions.ColumnOps.floorDiv(unix_micros(c), windowMicros)

    val leftB = left
      .withColumn("_bucket", explode(array(bucket(col(tsCol)) - 1, bucket(col(tsCol)))))
      .alias("l")
    val rightB = right
      .withColumn("_bucket", bucket(col(tsCol)))
      .alias("r")

    val cond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _) &&
      col("l._bucket") === col("r._bucket") &&
      rUs >= lUs - windowMicros && rUs <= lUs

    leftB.join(rightB, cond, "inner")
  }
}
