package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality metrics collected DURING an action via `observe` — row
  * count, per-column null counts, and a numeric min/max — at zero extra
  * cost: the aggregates ride along with whatever job materializes the
  * DataFrame (a write, a count), so a 100 TB load is never re-scanned just
  * to know how many rows or nulls it carried. This is the scale-correct
  * replacement for the `df.count(); df.filter(isnull).count(); ...`
  * pattern, which costs one full scan PER metric.
  */
object QualityMetrics {

  /** Attach an observation to `df`. After any action on the returned frame,
    * `observation.get` yields: `rows`, `nulls_<col>` for each requested
    * column, and `min_<c>`/`max_<c>` for each numeric bound column.
    */
  def observed(df: DataFrame, nullCols: Seq[String], boundCols: Seq[String] = Nil)
      : (DataFrame, Observation) = {
    val obs = Observation()
    val metrics =
      count(lit(1)).as("rows") +:
        (nullCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")) ++
          boundCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
