package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (SURVEY §2.2 "partitioning & shuffle": co-located
  * joins via bucketing).
  *
  * At 100 TB the biggest recurring cost is re-shuffling the same fact tables
  * on the same join key for every query. Writing them bucketed by that key
  * (`CLUSTERED BY (key) INTO n BUCKETS`) makes every subsequent equi-join /
  * aggregation on the key shuffle-FREE: Catalyst recognizes matching
  * bucketing on both sides and plans a SortMergeJoin with no Exchange.
  *
  * BucketedJoinSpec pins the guarantee: joining the bucketed twins of
  * lineitem and orders produces a plan with zero shuffle exchanges.
  */
object BucketedTables {

  /** Write `df` as a managed bucketed table (drops any previous incarnation,
    * including an orphaned warehouse directory from a crashed run).
    *
    * `sortBy` columns make the per-bucket files sorted; the scan reports
    * that ordering ONLY when each bucket is a single file, so the input is
    * repartitioned onto the bucket key first (one task → one file per
    * bucket). A sorted bucketed twin then feeds sort-merge shapes — the
    * equi-join AND the native as-of — with neither an Exchange nor a Sort.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sortBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val in = if (sortBy.isEmpty) df
      else df.repartition(buckets, org.apache.spark.sql.functions.col(key))
    val w = in.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortBy.isEmpty) w else w.sortBy(sortBy.head, sortBy.tail: _*))
      .saveAsTable(table)
  }

  /** Bucket the two big fact tables on the orderkey join key. */
  def bucketFacts(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    writeBucketed(spark.read.parquet(s"$dir/lineitem.parquet"),
      "lineitem_b", "l_orderkey", buckets, sortBy = Seq("l_orderkey"))
    writeBucketed(spark.read.parquet(s"$dir/orders.parquet"),
      "orders_b", "o_orderkey", buckets, sortBy = Seq("o_orderkey"))
  }

  /** The co-located join: correct on any tables, shuffle-free on bucketed
    * twins.
    */
  def colocatedRevenue(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val l = spark.table("lineitem_b")
    val o = spark.table("orders_b")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      // decimal sum: exact and order-insensitive (a double sum would differ
      // between bucketed and shuffled execution orders)
      .agg(sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("rev"),
        count(lit(1)).as("n"))
  }
}
