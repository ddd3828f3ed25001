package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale-safe global ranking (SURVEY §2.2 "window ranking" at scale).
  *
  * `Window.orderBy(...)` with no partitionBy moves the entire table into ONE
  * partition (Spark warns: "Moving all data to a single partition") — correct
  * at small SF, dead at 100 TB. This operator produces the same four
  * ranking columns with no single-partition stage:
  *
  *   1. `repartitionByRange(order)` + `sortWithinPartitions(order)` — the one
  *      unavoidable sort shuffle; partitions hold disjoint key ranges in
  *      ascending partition-id order.
  *   2. Local row numbers come free from the sorted iteration order via
  *      `monotonically_increasing_id()`: the expression's documented layout
  *      is (partitionId << 33) + localIndex, so `_pid = id >> 33` and
  *      `_lrn = (id & (2^33−1)) + 1` — pure codegen arithmetic, no window,
  *      no second shuffle. (Requires < 2^33 rows per partition — at 100 TB
  *      that is >10 GB of rows per partition even at one byte per row; size
  *      partitions long before that.) Determinism: the ordering must be
  *      total (caller supplies a unique tiebreaker), so the sorted partition
  *      content and iteration order are reproducible across job retries.
  *   3. Per-partition counts are one tiny aggregate job — P rows collected
  *      to the driver, the same bounded partition-count-sized model object
  *      `RDD.zipWithIndex` materializes; prefix-sums become a broadcast
  *      literal map, NOT a join.
  *   4. rank / percent_rank / cume_dist / ntile are then arithmetic over
  *      (globalRank, totalCount) — matching SQL semantics exactly for a
  *      duplicate-free ordering (rank == row_number).
  *
  * The input is persisted (MEMORY_AND_DISK) so the counts job and the main
  * job see identical range boundaries without recomputing the sort. This is
  * a correctness requirement, not a cache optimization: re-executing
  * `repartitionByRange` in two separate jobs may re-sample DIFFERENT range
  * bounds (the sampler is seeded by RDD id, which a re-planned execution
  * does not preserve), silently misaligning the offset map — hence no
  * opt-out. The cache is NOT unpersisted here (the returned frame still
  * depends on it): the caller owns the release — `spark.catalog
  * .clearCache()` or unpersist after materializing, as Verify/Bench do per
  * query.
  */
object GlobalRank {

  private final val IdxMask = (1L << 33) - 1

  /** Appends `rank` (BIGINT, == row_number for the total order), `pr`
    * (percent_rank, DOUBLE), `cd` (cume_dist, DOUBLE) and — when `tiles` > 0
    * — `tile` (BIGINT, NTILE(tiles)) computed without any single-partition
    * stage. `order` MUST be a total (duplicate-free) ordering.
    */
  def withRankColumns(df: DataFrame, order: Seq[Column], tiles: Int = 0,
      numPartitions: Option[Int] = None, validateOrder: Boolean = false): DataFrame = {
    if (validateOrder) GlobalCumSum.requireTotalOrder(df, order, "GlobalRank")
    val parts = numPartitions.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    val ranged = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Bounded driver-side model: one (pid, count) pair per partition.
    val counts: Array[(Int, Long)] = ranged
      .groupBy(shiftright(col("_mid"), 33).cast("int").as("_pid"))
      .count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.sortBy(_._1).map { case (pid, n) => val off = acc; acc += n; pid -> off }.toMap
    }

    val rank = (element_at(typedlit(offsets), shiftright(col("_mid"), 33).cast("int"))
      + col("_mid").bitwiseAND(IdxMask) + 1L).as("rank")
    val pr =
      if (total <= 1L) lit(0.0)
      else (col("rank") - 1L).cast("double") / lit((total - 1L).toDouble)
    val cd = col("rank").cast("double") / lit(total.toDouble)

    val out = ranged.withColumn("rank", rank)
      .withColumn("pr", pr)
      .withColumn("cd", cd)
    val withTile = if (tiles <= 0) out else {
      // SQL NTILE: first (total % tiles) tiles get one extra row.
      val base = total / tiles
      val rem = total % tiles
      val cut = rem * (base + 1) // ranks 1..cut live in the wide tiles
      // Integral `div`, NOT Column./ — double division then truncation can
      // flip a tile boundary once ranks approach 2^53 (ColumnOps explains;
      // all operands here are BIGINT).
      def idiv(a: Column, b: Long): Column =
        graft.functions.ColumnOps.idiv(a, lit(b))
      val tile =
        if (base == 0L) idiv(col("rank") - 1L, base + 1L) + 1L // total < tiles
        else when(col("rank") <= cut, idiv(col("rank") - 1L, base + 1L) + 1L)
          .otherwise(lit(rem) + idiv(col("rank") - cut - 1L, base) + 1L)
      out.withColumn("tile", tile.cast("long"))
    }
    withTile.drop("_mid")
  }
}
