package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale-safe global running sum — the cumulative-total primitive behind
  * sequence packing (q68) and any "running position in a global order"
  * computation.
  *
  * `Window.orderBy(...)` with no partitionBy funnels the whole table into
  * ONE task; this produces the same column with no single-partition stage,
  * the GlobalRank recipe applied to sums:
  *
  *   1. `repartitionByRange(order)` + `sortWithinPartitions(order)` — one
  *      sort shuffle; partitions hold disjoint key ranges in ascending
  *      partition-id order (`_pid = monotonically_increasing_id() >> 33`).
  *   2. The within-partition running sum is a PARTITIONED window
  *      (`Window.partitionBy(_pid).orderBy(_mid)`) — distributed, one pass
  *      over each sorted partition.
  *   3. Per-partition totals are one tiny aggregate — P rows to the driver,
  *      a bounded model object; prefix offsets become a broadcast literal
  *      map added in codegen, NOT a join.
  *
  * `order` MUST be a total (duplicate-free) ordering and `value` LONG-typed
  * non-null (sums stay exact; a double sum would be partition-order
  * dependent). Like GlobalRank, the ranged input is persisted so the totals
  * job and the main job see identical range boundaries; the CALLER owns the
  * release (clearCache / unpersist after materializing, as Verify/Bench do).
  */
object GlobalCumSum {

  private final val IdxMask = (1L << 33) - 1

  /** Appends `out` = running total of `value` over the global `order`,
    * inclusive of the current row.
    */
  def withCumSum(df: DataFrame, order: Seq[Column], value: Column, out: String,
      numPartitions: Option[Int] = None, persist: Boolean = true): DataFrame = {
    val parts = numPartitions.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    val ranged0 = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftright(col("_mid"), 33).cast("int"))
      .withColumn("_v", value.cast("long"))
    val ranged = if (persist) ranged0.persist(StorageLevel.MEMORY_AND_DISK) else ranged0

    // Bounded driver-side model: one (pid, sum) pair per partition.
    val totals: Array[(Int, Long)] = ranged
      .groupBy(col("_pid")).agg(sum(col("_v")).as("_s"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val offsets: Map[Int, Long] = {
      var acc = 0L
      totals.sortBy(_._1).map { case (pid, s) => val off = acc; acc += s; pid -> off }.toMap
    }

    val local = sum(col("_v")).over(
      Window.partitionBy(col("_pid")).orderBy(col("_mid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranged
      .withColumn(out,
        coalesce(element_at(typedlit(offsets), col("_pid")), lit(0L)) + local)
      .drop("_mid", "_pid", "_v")
  }
}
