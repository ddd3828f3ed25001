package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
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
  * Scale notes (100 TB):
  *   - `edges` is persisted so each round touches the deduplicated edge
  *     list, never the upstream candidate generator; min() is map-side
  *     combinable so hub nodes don't skew step (1).
  *   - The convergence probe rides the checkpoint job as an `observe()`
  *     metric (labels only ever decrease, so Σ label is strictly monotone
  *     until the fixpoint) — zero extra jobs or driver round-trips.
  *   - l₁ is materialized once per round; the pointer-double join consumes
  *     the stored blocks twice instead of recomputing the neighbor-min
  *     subplan for both join sides.
  *   - Step (2)'s probe side concentrates on a giant component's label. The
  *     hot-label split bounds that structurally: labels owning ≥
  *     `hotLabelThreshold` nodes (at most n/threshold of them — a bounded,
  *     model-sized set, like a centroid table) resolve through a broadcast
  *     map; only keys with < threshold rows ever reach the shuffled join.
  *     AQE's skew split remains as backstop for the cold path.
  */
object ConnectedComponents {

  /** @param pairs two-column DataFrame of undirected edges (u, v)
    * @param maxIters convergence bound; O(log n) rounds are expected, so 25
    *                 covers any plausible corpus (2^25 pointer depth)
    * @param hotLabelThreshold pointer-double probe keys with at least this
    *                 many rows are resolved via broadcast instead of shuffle
    * @param reliableDir when Some(dir), per-round materialization goes to
    *                 PARQUET under dir (durable spill on the cluster's
    *                 distributed FS) instead of localCheckpoint blocks —
    *                 the executor-loss-tolerant mode for long multi-round
    *                 runs over a 100 TB corpus, where losing one executor
    *                 mid-round must not restart the whole iteration (a lost
    *                 localCheckpoint block has NO lineage to recompute
    *                 from; a parquet round file re-reads). Costs one
    *                 write+read per round; default None keeps the
    *                 block-store fast path for short-lived jobs.
    * @return (node, rep) — rep is the minimum node id reachable from node;
    *         every node that appears in `pairs` gets a row
    */
  def apply(pairs: DataFrame, maxIters: Int = 25,
      hotLabelThreshold: Long = 100000L,
      reliableDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    val e0 = pairs.toDF("u", "v")
    val edgesPlan = e0.union(e0.select(col("v"), col("u")))
      .toDF("src", "dst")
      .distinct()
    // reliable mode spills the deduplicated edge list too: each round's
    // neighbor-min re-reads it, and persist() blocks are exactly as
    // executor-loss-fragile as localCheckpoint's
    val edges = reliableDir match {
      case None => edgesPlan.persist()
      case Some(dir) =>
        edgesPlan.write.mode("overwrite").parquet(s"$dir/cc_edges")
        spark.read.parquet(s"$dir/cc_edges")
    }
    // Each round's result is materialized (eager): the pointer-double
    // join references l₁ TWICE, so without materialization the neighbor-min
    // subplan runs twice per round and the logical plan doubles per round
    // (planning itself goes exponential). localCheckpoint materializes the
    // round and restarts lineage from the stored blocks; `reliableDir`
    // swaps in a parquet write+read per round — same shape, durable files.
    // The convergence probe rides the materialization job either way (one
    // action per round, no extra pass).
    // Seed with round 1's neighbor-min already applied: label₀(n) =
    // min(n, min neighbor) — one aggregation instead of a distinct plus a
    // full propagate round (every node appears as src of the bidirectional
    // edge list, so the groupBy also enumerates the node set).
    def checkpointObserved(df: DataFrame, name: String): (DataFrame, Long, Long) = {
      val obs = Observation(name)
      val observed = df
        .observe(obs, sum(col("label")).as("s"), count(lit(1)).as("n"))
      val out = reliableDir match {
        case None => observed.localCheckpoint(true)
        case Some(dir) =>
          observed.write.mode("overwrite").parquet(s"$dir/$name")
          spark.read.parquet(s"$dir/$name")
      }
      val m = obs.get
      // sum() over an empty frame is NULL — treat as 0 (degenerate empty graph)
      val s = Option(m("s")).fold(0L)(_.asInstanceOf[Long])
      (out, s, m("n").asInstanceOf[Long])
    }
    var (labels, prevSum, _) = checkpointObserved(
      edges.groupBy(col("src").as("node"))
        .agg(min(col("dst")).as("nbr"))
        .select(col("node"), least(col("node"), col("nbr")).as("label")),
      "cc_seed")
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // (1) neighbor-min, materialized once — both pointer-double sides and
      // the hot-label count read the stored blocks.
      val nbrMin = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(min(col("label")).as("nbr"))
      val (l1, _, l1Rows) = checkpointObserved(
        labels.join(nbrMin, Seq("node"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("nbr"), col("label"))).as("label")),
        s"cc_l1_$iter")
      // (2) l₂(n) = l₁(l₁(n)): labels are always node ids, so l₁ has a row
      // for every label value; left+coalesce is only a safety net. Hot
      // labels (≥ threshold probe rows) resolve through a BROADCAST of
      // their lookup rows — bounded at n/threshold rows, one
      // (label, l₁(label)) pair per hot label, id-type-generic (no driver
      // materialization) — so no shuffle key ever carries a giant
      // component's full row set. The split is gated on l1's total row
      // count (observed on the checkpoint job): below threshold — e.g. any
      // test-scale run — no label can be hot and the plain join runs with
      // zero extra cost.
      val lookup = l1.select(col("node").as("label"), col("label").as("label2"))
      val pointered =
        if (l1Rows < hotLabelThreshold) {
          l1.join(lookup, Seq("label"), "left")
            .select(col("node"), coalesce(col("label2"), col("label")).as("label"))
        } else {
          val hotLookup = l1.groupBy(col("label"))
            .agg(count(lit(1)).as("cnt"))
            .filter(col("cnt") >= hotLabelThreshold)
            .select(col("label"))
            .join(lookup, Seq("label"))
            .withColumnRenamed("label2", "hot2")
          val marked = l1.join(broadcast(hotLookup), Seq("label"), "left")
          val hotDone = marked.filter(col("hot2").isNotNull)
            .select(col("node"), col("hot2").as("label"))
          val coldDone = marked.filter(col("hot2").isNull)
            .join(lookup, Seq("label"), "left")
            .select(col("node"), coalesce(col("label2"), col("label")).as("label"))
          hotDone.union(coldDone)
        }
      val (next, nextSum, _) = checkpointObserved(pointered, s"cc_round_$iter")
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
