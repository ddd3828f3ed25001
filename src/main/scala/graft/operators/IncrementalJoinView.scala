package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** INCREMENTAL VIEW MAINTENANCE for an inner equi-join under append-only
  * deltas on BOTH sides — the classic counting-free delta rule (Blakeley-
  * Larson-Tompa SIGMOD'86; Griffin-Libkin for the general algebra):
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B₀  ∪  A₀ ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * with A₀/B₀ the accumulated state BEFORE the delta. Every joined pair is
  * produced exactly once: pairs of (old, old) were already in the view,
  * (new, old) and (old, new) come from the two cross terms, (new, new) from
  * the third. For append-only inputs no retraction bookkeeping is needed —
  * the view is itself append-only.
  *
  * State is three parquet dirs (accumulated A, accumulated B, the view) so
  * maintenance cost per batch is |ΔA ⋈ B| + |A ⋈ ΔB| + |ΔA ⋈ ΔB| — never a
  * recompute of A ⋈ B.
  *
  * Scale shape (100 TB): the dominant term joins a SMALL delta against the
  * big accumulated side — broadcast the delta and the term is a map-side
  * join over B's partitions (no B shuffle); key-partitioned accumulators
  * (bucketed dirs) make it a partition-pruned lookup. Durability of the
  * three appends follows the write-audit-publish pattern
  * ([[graft.streaming.VersionedView]]); this operator keeps plain appends —
  * the algebra, not the commit protocol, is what it adds.
  */
object IncrementalJoinView {

  final case class State(aDir: String, bDir: String, vDir: String)

  private def readOrEmpty(s: SparkSession, dir: String, like: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.schema(like.schema).parquet(dir)
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)
  }

  /** Applies one (ΔA, ΔB) batch: appends ΔV to the view and the deltas to
    * their accumulators. `usingKeys` are the equi-join columns present in
    * both inputs (using-join: emitted once in the view). Either delta may
    * be empty.
    */
  def applyDelta(s: SparkSession, st: State, deltaA: DataFrame, deltaB: DataFrame,
      usingKeys: Seq[String]): Unit = {
    val a0 = readOrEmpty(s, st.aDir, deltaA)
    val b0 = readOrEmpty(s, st.bDir, deltaB)
    val dV = deltaA.join(b0, usingKeys)
      .unionByName(a0.join(deltaB, usingKeys))
      .unionByName(deltaA.join(deltaB, usingKeys))
    dV.write.mode("append").parquet(st.vDir)
    deltaA.write.mode("append").parquet(st.aDir)
    deltaB.write.mode("append").parquet(st.bDir)
  }

  /** The maintained view (empty-safe read; `like` supplies the schema of a
    * prototype joined row, e.g. `deltaA.join(deltaB, keys).limit(0)`).
    */
  def view(s: SparkSession, st: State, like: DataFrame): DataFrame =
    readOrEmpty(s, st.vDir, like)
}
