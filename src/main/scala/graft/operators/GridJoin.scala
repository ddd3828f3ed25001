package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.floorDiv

/** Integer-grid SPATIAL self-join — the geohash/S2-cell bucketing pattern
  * reduced to exact integers: all point pairs within Chebyshev distance ≤ d
  * (|Δx| ≤ d ∧ |Δy| ≤ d — the square neighborhood; Euclidean and Manhattan
  * refine the same candidates with a different verify predicate).
  *
  * Cells of side d make the pigeonhole exact: two points within distance d
  * have cell coordinates differing by at most 1 per axis, so probing each
  * point's 3×3 cell neighborhood against an index of points in their OWN
  * cell yields a candidate superset with zero false negatives. The probe
  * side explodes 9 rows/point, the build side none, and the join is EQUI on
  * the cell key — candidate generation is linear in points × 9 (× local
  * density), never all-pairs. Emission is DIRECTIONAL (probe id < build
  * id): each qualifying pair materializes exactly once, so there is no
  * dedup shuffle at all — the same discipline as IntervalOverlapJoin's
  * bucket-ownership predicate.
  *
  * 100 TB shape: one postings-sized exchange on the cell key; skewed cells
  * (urban hot spots) salt like any hot equi-key. `d` is the resolution
  * trade: larger cells = fewer probe rows but denser candidate lists.
  */
object GridJoin {

  /** @param points (id BIGINT, x BIGINT, y BIGINT); coordinates may be
    *               negative (floor division keeps cells aligned below zero).
    * @return (id_a, id_b, dx, dy) with id_a < id_b, |dx|,|dy| ≤ d
    */
  def chebyshevSelfJoin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, d: Long): DataFrame = {
    require(d > 0, "grid distance must be positive")
    val p = points.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val build = p
      .withColumn("cx", floorDiv(col("x"), d))
      .withColumn("cy", floorDiv(col("y"), d))
    val probe = build
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        explode(sequence(col("cx") - 1, col("cx") + 1)).as("cx"),
        col("cy").as("cy0"))
      .select(col("id_a"), col("xa"), col("ya"), col("cx"),
        explode(sequence(col("cy0") - 1, col("cy0") + 1)).as("cy"))
    probe.join(
        build.select(col("id").as("id_b"), col("x").as("xb"),
          col("y").as("yb"), col("cx"), col("cy")),
        Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("xa") - col("xb")) <= d && abs(col("ya") - col("yb")) <= d)
      .select(col("id_a"), col("id_b"),
        (col("xb") - col("xa")).as("dx"), (col("yb") - col("ya")).as("dy"))
  }
}
