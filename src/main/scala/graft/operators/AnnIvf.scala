package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions
import graft.queries.VectorQueries.groupedTopK
import graft.sources.BucketedTables

/** IVF (inverted-file) approximate nearest neighbour — the second scale path
  * from SURVEY §2.2 ("an IVF or LSH-bucketed variant") next to AnnLsh.
  *
  * Train: mini k-means over DataFrame ops only — assignment is an
  * explode(centroids)×candidates scored with the codegen'd dot product
  * (unit-normalized corpora ⇒ max-dot = nearest), the update step computes
  * per-dimension means in EXACT decimal so centroids are bit-deterministic
  * regardless of partitioning (a double sum would make training
  * order-dependent). Centroids are a k×dim model — driver-side by design,
  * like any trained model object; the data never leaves executors.
  *
  * Search: candidates live in exactly one centroid bucket (inverted list);
  * each query probes its `nprobe` nearest centroids; the join is equi on the
  * centroid id and exact cosine re-ranks inside the probed lists. At 100 TB:
  * one narrow scan to assign, shuffle keyed by (tiny) centroid id, no
  * all-pairs anywhere.
  */
object AnnIvf {

  /** Train k centroids for `iters` Lloyd iterations. Deterministic: init =
    * the k lowest-vec_id vectors, exact-decimal mean updates.
    */
  def trainCentroids(emb: DataFrame, k: Int, iters: Int, dim: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = emb
      .orderBy(col("vec_id")).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(centroids.length == k,
      s"need $k init vectors, table has only ${centroids.length}")
    require(centroids.forall(_.length == dim),
      s"expected dim $dim, got dims ${centroids.map(_.length).distinct.mkString(",")}")

    for (_ <- 1 to iters) {
      val assigned = assign(emb, centroids)
      val means = assigned
        .select(col("cluster"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("v").cast(DecimalType(28, 14))).as("m")) // exact, order-free
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDecimal(2).doubleValue()
      }
      centroids = next
    }
    centroids
  }

  /** Nearest-centroid id for each row's `e` column (max dot). */
  private def assign(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    emb.withColumn("cluster", nearest(col("e"), centroids, 1).getItem(0))

  /** Ids of the `n` nearest centroids to `e`, best first. */
  private def nearest(e: Column, centroids: Array[Array[Double]], n: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(VectorFunctions.dot(e, typedlit(c.toSeq)).as("dot"), lit(i).as("id"))
    }: _*)
    // sort by dot desc (reverse of natural struct ordering), take n ids
    transform(slice(reverse(array_sort(scored)), 1, n), s => s.getField("id"))
  }

  /** IVF search: probe the `nprobe` nearest inverted lists per query, exact
    * cosine top-k within them.
    *
    * @param emb     (vec_id, e: array<double>)
    * @param queries (qid, qe: array<double>)
    */
  def topK(emb: DataFrame, queries: DataFrame, k: Int,
      centroids: Array[Array[Double]], nprobe: Int = 2): DataFrame = {
    val cands = assign(emb, centroids)
    val qs = queries
      .withColumn("cluster", explode(nearest(col("qe"), centroids, nprobe)))
    val scored = cands.join(qs, "cluster")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", VectorFunctions.cosine(col("e"), col("qe")))
    groupedTopK(scored, "qid", k, Seq(col("cos").desc, col("vec_id")))
      .select(col("qid"), col("rn"), col("vec_id"), col("cos"))
  }

  /** Materialize the inverted lists ONCE: the corpus assignment is written as
    * a managed parquet table bucketed by cluster id. Every subsequent query
    * batch skips re-assignment (the expensive centroid scoring over the full
    * corpus) and joins straight onto the stored lists.
    */
  def buildIndex(emb: DataFrame, centroids: Array[Array[Double]],
      table: String, buckets: Int = 8): Unit =
    BucketedTables.writeBucketed(assign(emb, centroids), table, "cluster", buckets)

  /** INCREMENTAL index maintenance: assign a batch of NEW vectors to their
    * centroids and APPEND into the existing bucketed index table (the
    * bucket spec must match buildIndex's — Spark validates it). Per-batch
    * cost is the batch's own assignment plus one bucketed write; the
    * resident corpus is never re-read, re-assigned, or re-shuffled, and the
    * index stays queryable throughout. Centroid drift is handled by a
    * periodic full `buildIndex` — the standard IVF split between cheap
    * append maintenance and occasional re-clustering.
    *
    * A bare append is NOT idempotent: re-appending a batch (an at-least-once
    * replay, an operator retry) duplicates its vec_ids, and duplicates
    * surface verbatim in topKIndexed results. `dedupVecIds = true` makes the
    * append idempotent via a left-anti join of the batch against the stored
    * vec_ids — per-batch cost is one scan of the index's id column (a few
    * bytes/row; at 100 TB an id-only column scan, not a corpus read) against
    * the batch's hash side. Keep it off only when the caller already
    * guarantees uniqueness (e.g. an upstream exactly-once source).
    *
    * The id scan also SHUFFLES the ids (the table is bucketed by cluster,
    * not vec_id, so the anti-join cannot reuse its layout). An id-bucketed
    * sidecar — the `LshIndex.storedIds` pattern — would make the store side
    * exchange-free, but is deliberately NOT used here: the anti-join
    * against the MAIN table is what makes a replay-after-complete a no-op,
    * and a sidecar written in a second job reintroduces a crash window
    * between the two writes (either duplicate vectors or lost vectors,
    * depending on write order). Closing that window needs per-batch
    * partition overwrite of the index itself (a `_batch`-partitioned
    * layout); until an operator needs that, the honest per-batch cost here
    * is one id-column scan + id-sized shuffle.
    */
  def appendToIndex(batch: DataFrame, centroids: Array[Array[Double]],
      table: String, buckets: Int = 8, dedupVecIds: Boolean = false): Unit = {
    val assigned = assign(batch, centroids)
    val toWrite =
      if (dedupVecIds)
        assigned.join(batch.sparkSession.table(table).select("vec_id"),
          Seq("vec_id"), "left_anti")
      else assigned
    toWrite.write.mode("append").format("parquet")
      .bucketBy(buckets, "cluster").saveAsTable(table)
  }

  /** Streaming twin of [[appendToIndex]]: maintain the index from an
    * unbounded stream of (vec_id, e). foreachBatch is AT-LEAST-ONCE — a
    * batch replayed after a failure re-runs its append — so the default
    * here guards the sink with `dedupVecIds = true`: a replayed batch's ids
    * anti-join away and the append becomes idempotent without a
    * transactional table format.
    */
  def maintainIndexStream(stream: DataFrame, centroids: Array[Array[Double]],
      table: String, checkpoint: String, buckets: Int = 8,
      dedupVecIds: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        appendToIndex(b, centroids, table, buckets, dedupVecIds)
      }
      .start()

  /** Search a prebuilt index: a pure equi-join of the (bounded, broadcast)
    * probe batch onto the stored lists — the corpus side streams with NO
    * shuffle exchange because the probe side broadcasts (pinned by
    * ScaleOpsSpec); the only shuffle in the plan is groupedTopK's
    * k·partitions-row partial top-k merge. The bucketing-by-cluster is NOT
    * what makes this plan shuffle-free — it buys (a) bucket-pruned scans
    * when a cluster-key filter is pushed (probe only nprobe/k of the data)
    * and (b) an exchange-free sort-merge fallback if a probe batch ever
    * outgrows broadcast. At 100 TB this is the IVF search you want: index
    * built once per corpus version, per-batch cost independent of corpus
    * assignment.
    */
  def topKIndexed(spark: SparkSession, table: String, queries: DataFrame,
      k: Int, centroids: Array[Array[Double]], nprobe: Int = 2): DataFrame = {
    val cands = spark.table(table)
    val qs = queries
      .withColumn("cluster", explode(nearest(col("qe"), centroids, nprobe)))
    val scored = cands.join(broadcast(qs), "cluster")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", VectorFunctions.cosine(col("e"), col("qe")))
    groupedTopK(scored, "qid", k, Seq(col("cos").desc, col("vec_id")))
      .select(col("qid"), col("rn"), col("vec_id"), col("cos"))
  }
}
