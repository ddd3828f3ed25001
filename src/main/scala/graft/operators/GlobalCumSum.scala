package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.storage.StorageLevel

/** Scale-safe global running sum — the cumulative-total primitive behind
  * sequence packing (q68) and any "running position in a global order"
  * computation.
  *
  * `Window.orderBy(...)` with no partitionBy funnels the whole table into
  * ONE task; this produces the same column with no single-partition stage
  * and exactly ONE shuffle, the GlobalRank recipe applied to sums:
  *
  *   1. `repartitionByRange(order)` + `sortWithinPartitions(order)` — the
  *      one sort shuffle; partitions hold disjoint key ranges in ascending
  *      partition-id order.
  *   2. Within-partition prefix sums are ONE imperative pass per sorted
  *      partition (`mapPartitionsWithIndex`). A partitioned window
  *      (`Window.partitionBy(pid)`) would be semantically identical but
  *      RangePartitioning does not satisfy the window's clustered
  *      distribution, so Catalyst would insert a SECOND full-table hash
  *      exchange — running sums are data-dependent (unlike GlobalRank's row
  *      numbers, which fall out of `monotonically_increasing_id`
  *      arithmetic), so this is the sanctioned per-partition-imperative
  *      `mapPartitions` case. Cost: one codegen boundary at the RDD
  *      round-trip, instead of re-shuffling the table.
  *   3. Per-partition totals are one tiny aggregate over the cached pass —
  *      P rows to the driver, a bounded model object; prefix offsets become
  *      a broadcast literal map added in codegen, NOT a join.
  *
  * `order` MUST be a total (duplicate-free) ordering and `value` an
  * integral non-null column (enforced; long sums stay exact — a double sum
  * would be partition-order dependent, and a silent cast from fractional
  * values would corrupt every total). The augmented pass is persisted so
  * the totals job and the output read identical partition content —
  * re-executing `repartitionByRange` in two separate jobs may re-sample
  * different range bounds (the sampler is seeded by RDD id), which would
  * silently misalign the offset map. The CALLER owns the release
  * (clearCache / unpersist after materializing, as Verify/Bench do).
  */
object GlobalCumSum {

  /** The long monoid the running pass folds with. `combineCol` is the SAME
    * combine expressed over Columns, used to merge the broadcast partition
    * offset into the local accumulator in codegen.
    */
  private final case class LongMonoid(
      zero: Long,
      combine: (Long, Long) => Long,
      combineCol: (Column, Column) => Column,
      aggOf: Column => Column)

  private val SumM = LongMonoid(0L, _ + _, _ + _, sum)
  private val MaxM = LongMonoid(Long.MinValue, math.max, greatest(_, _), max)

  /** Strips sort direction from an order column, yielding the groupable
    * key expression — `col("x").desc` is a SortOrder wrapper that groupBy
    * would reject.
    */
  private def keyOf(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.stripSortOrder(c)

  /** Opt-in totality check for the `order` contract: one aggregate pass
    * that fails LOUDLY on the first duplicate key instead of letting a
    * non-total order silently make prefix values partition-placement-
    * dependent. Costs one extra shuffle over `df` — debug/first-deploy
    * tooling, not the hot path (same guard philosophy as
    * PartitionlessWindowGuard).
    */
  def requireTotalOrder(df: DataFrame, order: Seq[Column], who: String): Unit = {
    val dup = df.groupBy(order.map(keyOf): _*).count()
      .where(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"$who: order is not total — duplicate key ${dup.headOption.getOrElse("")} " +
        "(prefix results would depend on partition placement; extend the " +
        "order with a unique tie-break column)")
  }

  /** Appends `out` = running total of `value` over the global `order`,
    * inclusive of the current row. `validateOrder=true` runs the
    * [[requireTotalOrder]] duplicate check first.
    */
  def withCumSum(df: DataFrame, order: Seq[Column], value: Column, out: String,
      numPartitions: Option[Int] = None, validateOrder: Boolean = false): DataFrame = {
    if (validateOrder) requireTotalOrder(df, order, "GlobalCumSum")
    withCumAgg(df, order, value, out, SumM, numPartitions)
  }

  /** Appends `out` = running MAXIMUM of `value` over the global `order`,
    * inclusive of the current row — the prefix-max primitive behind
    * sweep-style dominance queries (skyline q144): same one-shuffle recipe,
    * max monoid. For the exclusive variant, lag(out) over the same order —
    * or, as q144 does, collapse to group-level rows first and lag there.
    */
  def withCumMax(df: DataFrame, order: Seq[Column], value: Column, out: String,
      numPartitions: Option[Int] = None, validateOrder: Boolean = false): DataFrame = {
    if (validateOrder) requireTotalOrder(df, order, "GlobalCumSum.max")
    withCumAgg(df, order, value, out, MaxM, numPartitions)
  }

  private def withCumAgg(df: DataFrame, order: Seq[Column], value: Column, out: String,
      m: LongMonoid, numPartitions: Option[Int]): DataFrame = {
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val withV = df.withColumn("_v", value)
    val vType = withV.schema("_v").dataType
    require(Seq("byte", "short", "integer", "long").contains(vType.typeName),
      s"GlobalCumSum value must be integral (got $vType): a fractional cast " +
        "would silently truncate; cast and round explicitly if that is intended")
    val ranged = withV.withColumn("_v", col("_v").cast("long"))
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)

    // One imperative pass per sorted partition: local running fold + the
    // partition id the row was ranged into.
    val vIdx = ranged.schema.fieldIndex("_v")
    val (zero, combine) = (m.zero, m.combine)
    val augmentedRdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = zero
      it.map { r =>
        acc = combine(acc, r.getLong(vIdx))
        Row.fromSeq(r.toSeq :+ pid :+ acc)
      }
    }
    val augmented = spark.createDataFrame(augmentedRdd,
        ranged.schema.add("_pid", IntegerType).add("_local", LongType))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Bounded driver-side model: one (pid, total) pair per partition.
    val totals: Array[(Int, Long)] = augmented
      .groupBy(col("_pid")).agg(m.aggOf(col("_v")).as("_s"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val offsets: Map[Int, Long] = {
      var acc = m.zero
      totals.sortBy(_._1).map { case (pid, s) => val off = acc; acc = m.combine(acc, s); pid -> off }.toMap
    }

    augmented
      .withColumn(out,
        m.combineCol(coalesce(element_at(typedlit(offsets), col("_pid")), lit(m.zero)),
          col("_local")))
      .drop("_v", "_pid", "_local")
  }
}
