package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.idiv

/** INTERVAL-INTERVAL overlap join — both sides carry half-open event-time
  * intervals `[start, end)` and a pair matches when the intervals intersect
  * (`ls < re && rs < le`). The companion to [[RangeJoin]] (point-in-interval):
  * ad-exposure × session attribution, maintenance-window × job-run
  * accounting, any "how long were these two things true at once" question.
  *
  * Scale shape (the same bucketing discipline as RangeJoin): each side
  * explodes into the fixed-width time buckets its interval spans (bounded
  * expansion: span/width + 1 rows per interval — size `bucketUs` to the
  * typical interval so this stays O(1)); the join is then EQUI on
  * (keys…, bucket) — shuffle-partitionable, broadcastable, AQE-skew-
  * splittable, never a theta/cartesian. A pair whose intervals span
  * multiple shared buckets would match once per bucket; instead of a
  * `distinct()` (a second full shuffle), each pair is kept ONLY in the
  * bucket containing the OVERLAP START `max(ls, rs)` — that instant lies
  * inside both intervals, so both sides are guaranteed to have exploded
  * into its bucket, and it is unique per pair: a map-side predicate
  * replaces the dedup shuffle.
  */
object IntervalOverlapJoin {

  /** Joins `left` (with `[ls, le)` µs columns) to `right` (`[rs, re)`) on
    * equal `keys` + interval overlap. Output carries every column of both
    * sides (the four bound columns must be distinctly named).
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      ls: String, le: String, rs: String, re: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucket width must be positive")
    // Half-open semantics: an empty interval (le <= ls) contains no instant,
    // so it can overlap nothing — and its bucket sequence would run
    // descending (start > stop). Dropped map-side on each branch.
    val lb = left.where(col(le) > col(ls)).withColumn("_bl",
      explode(sequence(idiv(col(ls), lit(bucketUs)),
        idiv(col(le) - 1L, lit(bucketUs)))))
    val rb = right.where(col(re) > col(rs)).withColumn("_br",
      explode(sequence(idiv(col(rs), lit(bucketUs)),
        idiv(col(re) - 1L, lit(bucketUs)))))
    val cond = keys.map(k => lb(k) === rb(k))
      .reduce(_ && _) &&
      lb("_bl") === rb("_br") &&
      lb(ls) < rb(re) && rb(rs) < lb(le) &&
      lb("_bl") === idiv(greatest(lb(ls), rb(rs)), lit(bucketUs))
    // keep one copy of each join key (the left side's)
    keys.foldLeft(lb.join(rb, cond).drop("_bl", "_br"))((df, k) => df.drop(rb(k)))
  }
}
