package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INCREMENTAL connected components over a stream of edge INSERTIONS —
  * distributed union-find: the streaming twin of
  * [[graft.operators.ConnectedComponents]], maintaining a (node, rep)
  * component map whose fixpoint equals batch CC over every edge seen,
  * under ANY batch split.
  *
  * Per micro-batch:
  *   1. CONTRACT: map both endpoints of each batch edge through the
  *      current rep (unseen nodes represent themselves) and drop edges
  *      already internal to one component — connectivity is preserved
  *      because reps are, by induction, connected to their members;
  *   2. batch-local CC on the contracted edges (the pointer-doubling
  *      operator) — work is bounded by batch size + TOUCHED components,
  *      never the accumulated graph;
  *   3. REMAP: the result is a rep-level old→new map (touched-component-
  *      sized, broadcastable); existing members relabel through one join
  *      on their rep, new nodes insert with their resolved rep;
  *   4. publish through the versioned write-audit protocol (batchId
  *      naming = replay idempotent, same as every VersionedView sink).
  *
  * Min-label invariant: batch CC emits the MINIMUM member as rep, and
  * contraction only ever feeds it current reps (themselves minimum member
  * ids) and new node ids — so the maintained rep is the min node id of the
  * full component, exactly batch CC's contract, which is what lets one
  * oracle gate both.
  *
  * 100 TB shape: the state table is node-sized and touched once per batch
  * (one rep-keyed join + one anti-join insert); the CC rounds run on the
  * CONTRACTED graph only. A deployment stores state bucketed by rep so the
  * relabel join opens only touched buckets.
  */
object IncrementalCC {

  /** foreachBatch sink over an edge stream with LONG columns (`u`, `v`).
    * Read the map back with [[VersionedView.read]] (columns node, rep).
    *
    * The inner CC runs in `reliableDir` mode (per-round parquet spill under
    * `<stateOut>/_ccwork`, overwritten each batch) — not only for
    * durability: `localCheckpoint` CARRIES the origin plan's sizeInBytes
    * estimate onto each round's LogicalRDD, and the pointer-double step
    * joins a round's checkpoint WITH ITSELF, so the carried estimate
    * SQUARES every round (bit-length doubles). Seeded from a streaming
    * micro-batch (default, i.e. huge, stats), the stats BigInts reach
    * millions of bits within ~15 rounds and `rewriteStatsAndConstraints`
    * inside the next checkpoint call grinds the stream-execution thread
    * for minutes — found by this sink's sf0.1 gate. Parquet round files
    * restart every round from REAL file-sized stats; nothing compounds.
    */
  def ccSink(stateOut: String): (DataFrame, Long) => Unit =
    VersionedView.versionedSinkShared(stateOut) { (batch, cur) =>
      val ccWork = Some(s"$stateOut/_ccwork")
      // self-loops carry no connectivity and are dropped up front, so a
      // node appearing ONLY in self-loops is consistently absent from the
      // map in both the first-batch and incremental branches
      val edges = batch.select(col("u").cast("long").as("u"),
        col("v").cast("long").as("v"))
        .filter(col("u") =!= col("v"))
      cur match {
        case None =>
          graft.operators.ConnectedComponents(edges, reliableDir = ccWork)
        case Some(st) =>
          val repOf = st.select(col("node"), col("rep"))
          val contracted = edges
            .join(repOf.select(col("node").as("u"), col("rep").as("ru")), Seq("u"), "left")
            .join(repOf.select(col("node").as("v"), col("rep").as("rv")), Seq("v"), "left")
            .select(coalesce(col("ru"), col("u")).as("u"),
              coalesce(col("rv"), col("v")).as("v"))
            .filter(col("u") =!= col("v"))
          val remap = graft.operators
            .ConnectedComponents(contracted, reliableDir = ccWork)
            .select(col("node").as("old"), col("rep").as("new_rep"))
            .filter(col("old") =!= col("new_rep"))
          // 3a. relabel existing members whose rep merged into a new one
          val relabeled = st
            .join(remap.withColumnRenamed("old", "rep"), Seq("rep"), "left")
            .select(col("node"), coalesce(col("new_rep"), col("rep")).as("rep"))
          // 3b. insert batch nodes unseen so far, with their resolved rep
          val batchNodes = edges.select(col("u").as("node"))
            .unionByName(edges.select(col("v").as("node"))).distinct()
          val fresh = batchNodes
            .join(st.select(col("node")), Seq("node"), "left_anti")
            .join(remap.withColumnRenamed("old", "node"), Seq("node"), "left")
            .select(col("node"), coalesce(col("new_rep"), col("node")).as("rep"))
          relabeled.unionByName(fresh)
      }
    }
}
