package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation with pointer
  * doubling — the step that turns near-duplicate PAIRS into duplicate
  * CLUSTERS so a dedup pipeline can keep exactly one representative per
  * cluster (pairs alone under-delete: a–b and b–c dropped pairwise can still
  * keep two of {a,b,c}).
  *
  * Algorithm per round, all as shuffled joins/aggregations (no driver-side
  * graph state):
  *   (1) neighbor-min   l₁(n) = min(l(n), min over neighbors m of l(m))
  *   (2) pointer double l₂(n) = l₁(l₁(n))
  * Step (1) alone converges in O(diameter) rounds; (2) halves the remaining
  * pointer depth each round, giving O(log n) overall — the same bound as the
  * large-star/small-star MapReduce formulation (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14), with the label table
  * playing the parent array.
  *
  * Scale notes (100 TB): `edges` is persisted so each round touches the
  * deduplicated edge list, never the upstream candidate generator; min() is
  * map-side combinable so hub nodes don't skew step (1); step (2)'s join key
  * is the label, where big components concentrate — AQE's skew-join split
  * handles that at runtime. The only driver-side value per round is the
  * 1-bit "did any label change" convergence probe.
  */
object ConnectedComponents {

  /** @param pairs two-column DataFrame of undirected edges (u, v)
    * @return (node, rep) — rep is the minimum node id reachable from node;
    *         every node that appears in `pairs` gets a row
    */
  def apply(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    val e0 = pairs.toDF("u", "v")
    val edges = e0.union(e0.select(col("v"), col("u")))
      .toDF("src", "dst")
      .distinct()
      .persist()
    // Each round's result is localCheckpoint'ed (eager): `next` references l₁
    // TWICE, so without lineage truncation the logical plan doubles per round
    // and planning itself goes exponential. localCheckpoint materializes the
    // round and restarts lineage from the stored blocks; on a real cluster
    // with executor loss in play, swap in reliable checkpoint() to a
    // distributed FS — same call shape, fault-tolerant blocks.
    // Seed with round 1's neighbor-min already applied: label₀(n) =
    // min(n, min neighbor) — one aggregation instead of a distinct plus a
    // full propagate round (every node appears as src of the bidirectional
    // edge list, so the groupBy also enumerates the node set).
    var labels = edges.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("nbr"))
      .select(col("node"), least(col("node"), col("nbr")).as("label"))
      .localCheckpoint(true)
    // Convergence probe: labels only ever DECREASE (least/min of node ids),
    // so Σ label strictly decreases until the fixpoint — one map-side
    // aggregate over the already-checkpointed round, no join needed.
    def labelSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("label"))).head.getLong(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(min(col("label")).as("nbr"))
      val l1 = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
      // l₂(n) = l₁(l₁(n)): labels are always node ids, so l₁ has a row for
      // every label value; left+coalesce is only a safety net
      val next = l1
        .join(l1.select(col("node").as("label"), col("label").as("label2")),
          Seq("label"), "left")
        .select(col("node"), coalesce(col("label2"), col("label")).as("label"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    require(converged, s"connectedComponents: not converged after $maxIters rounds")
    edges.unpersist()
    labels.withColumnRenamed("label", "rep")
  }
}
