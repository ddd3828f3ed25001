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

  /** r13 (guide §2.4): [[withCumSum]] that ALSO appends `outLead` = the
    * next row's value of `leadHead` over the same global order — lead(1)
    * without a second range shuffle, a GlobalRank pass and a rank+1
    * self-join (the q119 successor recipe this replaces cost two extra
    * hash exchanges of the sweep). The local look-ahead rides the same
    * imperative pass; each partition's LAST row takes the FIRST `leadHead`
    * of the next non-empty partition from a P-entry driver map (collected
    * by the same totals aggregate). `leadHead` MUST be the leading column
    * of `order`, ascending and long-typed — that is what makes the next
    * partition's first value its MIN, a plain aggregate instead of a
    * first-row job. The global last row's lead is NULL.
    */
  def withCumSumAndLead(df: DataFrame, order: Seq[Column], value: Column, out: String,
      leadHead: String, outLead: String,
      numPartitions: Option[Int] = None): DataFrame =
    withCumAgg(df, order, value, out, SumM, numPartitions,
      leadOf = Some((leadHead, outLead)))

  /** r13: [[withCumMax]] that ALSO appends `outExcl` = the EXCLUSIVE
    * running max (the max over all STRICTLY earlier rows; Long.MinValue
    * for the global first row) — lag-of-running-max without GlobalRank +
    * a rank+1 self-join (the q144 predecessor recipe). Free in the same
    * pass: the exclusive value is the accumulator BEFORE folding the
    * current row, combined with the same partition offset.
    */
  def withCumMaxExclusive(df: DataFrame, order: Seq[Column], value: Column,
      out: String, outExcl: String,
      numPartitions: Option[Int] = None): DataFrame =
    withCumAgg(df, order, value, out, MaxM, numPartitions,
      exclOut = Some(outExcl))

  private def withCumAgg(df: DataFrame, order: Seq[Column], value: Column, out: String,
      m: LongMonoid, numPartitions: Option[Int],
      leadOf: Option[(String, String)] = None,
      exclOut: Option[String] = None): DataFrame = {
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

    // One imperative pass per sorted partition: local running fold (+ the
    // optional one-row look-ahead and pre-fold exclusive value) + the
    // partition id the row was ranged into.
    val vIdx = ranged.schema.fieldIndex("_v")
    val lIdx = leadOf.map { case (name, _) =>
      require(ranged.schema(name).dataType.typeName == "long",
        s"GlobalCumSum lead column $name must be long")
      ranged.schema.fieldIndex(name)
    }
    val emitExcl = exclOut.isDefined
    val (zero, combine) = (m.zero, m.combine)
    val augmentedRdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      new Iterator[Row] {
        private var acc = zero
        private var cur: Row = if (it.hasNext) it.next() else null
        def hasNext: Boolean = cur != null
        def next(): Row = {
          val nxt = if (it.hasNext) it.next() else null
          val excl = acc
          acc = combine(acc, cur.getLong(vIdx))
          var fields = cur.toSeq :+ pid :+ acc
          lIdx.foreach { i =>
            fields = fields :+ (if (nxt == null) null else java.lang.Long.valueOf(nxt.getLong(i)))
          }
          if (emitExcl) fields = fields :+ excl
          val r = Row.fromSeq(fields)
          cur = nxt
          r
        }
      }
    }
    val augSchema = {
      var sc = ranged.schema.add("_pid", IntegerType).add("_local", LongType)
      if (lIdx.isDefined) sc = sc.add("_lead", LongType, nullable = true)
      if (emitExcl) sc = sc.add("_lexcl", LongType)
      sc
    }
    val augmented = spark.createDataFrame(augmentedRdd, augSchema)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Bounded driver-side model: one (pid, total[, first lead-head]) row
    // per non-empty partition.
    val totalsAggs = m.aggOf(col("_v")).as("_s") +:
      leadOf.map { case (name, _) => min(col(name)).as("_f") }.toSeq
    val totalRows = augmented
      .groupBy(col("_pid")).agg(totalsAggs.head, totalsAggs.tail: _*)
      .collect()
    val totals: Array[(Int, Long)] = totalRows.map(r => (r.getInt(0), r.getLong(1)))
    val offsets: Map[Int, Long] = {
      var acc = m.zero
      totals.sortBy(_._1).map { case (pid, s) => val off = acc; acc = m.combine(acc, s); pid -> off }.toMap
    }
    // next non-empty partition's first lead-head value, per partition id
    val nextFirst: Map[Int, Long] = if (lIdx.isEmpty) Map.empty else {
      val firsts = totalRows.map(r => (r.getInt(0), r.getLong(2))).sortBy(_._1)
      firsts.zip(firsts.drop(1)).map { case ((pid, _), (_, f)) => pid -> f }.toMap
    }

    val base = augmented
      .withColumn(out,
        m.combineCol(coalesce(element_at(typedlit(offsets), col("_pid")), lit(m.zero)),
          col("_local")))
    val withLead = leadOf.fold(base) { case (_, outLead) =>
      val boundary = if (nextFirst.isEmpty) lit(null).cast(LongType)
        else element_at(typedlit(nextFirst), col("_pid"))
      base.withColumn(outLead, coalesce(col("_lead"), boundary))
    }
    val withExcl = exclOut.fold(withLead) { name =>
      withLead.withColumn(name,
        m.combineCol(coalesce(element_at(typedlit(offsets), col("_pid")), lit(m.zero)),
          col("_lexcl")))
    }
    withExcl.drop(Seq("_v", "_pid", "_local") ++
      (if (lIdx.isDefined) Seq("_lead") else Nil) ++
      (if (emitExcl) Seq("_lexcl") else Nil): _*)
  }
}
