package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (SURVEY §2.2 [EXT]: "latest right row with
  * right.ts <= left.ts per key") — the natural tick-data lookup the
  * reference's MySQL 5.7 surface could only emulate with correlated
  * subqueries.
  *
  * Spark has no built-in as-of join; this implements the scalable
  * union + windowed last() formulation (SURVEY §7.3.3):
  *
  *   1. tag right rows 0 and left rows 1, union them on (keys, ts, tag);
  *   2. one shuffle on the key columns, one sort by (ts, tag) inside each
  *      partition — identical cost profile to a sort-merge join;
  *   3. running last(right payload, ignoreNulls) gives every left row the
  *      most recent right row at or before its timestamp (tag 0 < 1 makes
  *      the match inclusive on ts equality);
  *   4. keep the left rows.
  *
  * At 100 TB this is ONE shuffle of left+right with no row amplification —
  * strictly better than the non-equi-join fallback Catalyst would pick
  * (BroadcastNestedLoopJoin) for the same predicate.
  *
  * Rows in `right` must be unique per (keys, ts) — pre-aggregate if not,
  * otherwise "the" match is ambiguous (the reference stack has the same
  * requirement, it just never documents it).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side, unique per (keys, tsCol)
    * @param keys       equality key column names (present on both sides)
    * @param tsCol      timestamp column name (present on both sides)
    * @param rightVals  right payload columns to carry; emitted as
    *                   `<prefix><name>` alongside `<prefix><tsCol>`
    * @param prefix     prefix for emitted right columns
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightVals: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideCol = "_asof_side"

    // left payload columns ride along as nulls on the right side
    val extraLeft = leftCols.filterNot(c => keys.contains(c) || c == tsCol)

    // The right timestamp and ALL payload columns travel as ONE struct so a
    // single last(_, ignoreNulls) matches them atomically: every emitted
    // column comes from the SAME right row, and a right payload value that
    // is genuinely NULL survives (filling each column independently would
    // silently substitute it from an older row).
    val payloadCol = "_r_payload"
    val payloadType = org.apache.spark.sql.types.StructType(
      right.schema(tsCol) +: rightVals.map(right.schema(_)))

    val rightUnion = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as(sideCol)) ++
        extraLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct((tsCol +: rightVals).map(col): _*).as(payloadCol)): _*)
    val leftUnion = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as(sideCol)) ++
        extraLeft.map(col) ++
        Seq(lit(null).cast(payloadType).as(payloadCol)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = last(col(payloadCol), ignoreNulls = true).over(w)
    val matchedCols: Seq[Column] =
      matched.getField(tsCol).as(s"$prefix$tsCol") +:
        rightVals.map(c => matched.getField(c).as(s"$prefix$c"))

    rightUnion.unionByName(leftUnion)
      .select((keys.map(col) ++ Seq(col(tsCol), col(sideCol)) ++ extraLeft.map(col)) ++ matchedCols: _*)
      .filter(col(sideCol) === 1)
      .drop(sideCol)
  }
}
