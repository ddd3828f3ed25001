package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Generic iterative-fixpoint executor — the engine's hand-rolled twin of a
  * recursive CTE (`WITH RECURSIVE anchor UNION ALL step`). Spark 4 executes
  * recursive CTEs through `UnionLoopExec`, which drives the loop from the
  * planner and materializes every iteration; this operator exposes the same
  * semantics as a library call with two properties the built-in loop lacks:
  *
  *   - **Lineage truncation per round.** Each frontier is materialized
  *     (localCheckpoint blocks, or durable parquet in `reliableDir` mode) so
  *     round N's plan never embeds rounds 0..N-1 — without it the step plan
  *     nests once per round and planning itself goes super-linear.
  *   - **Executor-loss tolerance.** `reliableDir` spills every frontier to
  *     the cluster's distributed FS (same trade as
  *     [[ConnectedComponents]]'s reliable mode): a lost executor re-reads a
  *     round file instead of restarting the whole recursion — the difference
  *     between "documented" and "works" for a multi-hour 100 TB walk.
  *
  * The emptiness probe rides each round's materialization job as an
  * `observe()` count — one action per round, no extra pass. The final result
  * in reliable mode is ONE parquet scan over all round files (not an N-way
  * in-memory union), so downstream aggregation sees a plain multi-file scan.
  */
object IterativeFixpoint {

  /** @param anchor   round-0 frontier (the recursive CTE's anchor term)
    * @param step     maps frontier N to frontier N+1 (the recursive term);
    *                 must preserve the anchor's schema
    * @param maxRounds hard recursion bound (mirrors
    *                 `spark.sql.cteRecursionLevelLimit`'s role)
    * @param reliableDir when Some(dir), per-round frontiers spill to parquet
    *                 under dir — executor-loss-tolerant mode
    * @return the union of every round's frontier (rounds 0..K, K = first
    *         empty frontier), exactly the recursive CTE's result set
    */
  def iterate(anchor: DataFrame, step: DataFrame => DataFrame,
      maxRounds: Int = 100, reliableDir: Option[String] = None): DataFrame = {
    val spark = anchor.sparkSession
    def materialize(df: DataFrame, name: String): (DataFrame, Long) = {
      val obs = Observation(name)
      val observed = df.observe(obs, count(lit(1)).as("n"))
      val out = reliableDir match {
        case None => observed.localCheckpoint(true)
        case Some(dir) =>
          observed.write.mode("overwrite").parquet(s"$dir/$name")
          spark.read.parquet(s"$dir/$name")
      }
      (out, obs.get("n").asInstanceOf[Long])
    }
    var (frontier, n) = materialize(anchor, "fix_round_0")
    val anchorSchema = frontier.schema
    val rounds = scala.collection.mutable.ArrayBuffer(frontier)
    var round = 0
    while (n > 0 && round < maxRounds) {
      round += 1
      val nextPlan = step(frontier)
      require(nextPlan.schema.map(f => (f.name, f.dataType)) ==
        anchorSchema.map(f => (f.name, f.dataType)),
        s"step changed the frontier schema at round $round: " +
          s"${nextPlan.schema.simpleString} vs ${anchorSchema.simpleString}")
      val (next, nextN) = materialize(nextPlan, s"fix_round_$round")
      frontier = next
      n = nextN
      if (n > 0) rounds += next
    }
    require(n == 0, s"iterative fixpoint: frontier still non-empty after " +
      s"$maxRounds rounds ($n rows)")
    reliableDir match {
      // one scan over all round files — not an N-way union plan
      case Some(dir) =>
        spark.read.parquet(rounds.indices.map(i => s"$dir/fix_round_$i"): _*)
      case None => rounds.reduce(_ union _)
    }
  }
}
