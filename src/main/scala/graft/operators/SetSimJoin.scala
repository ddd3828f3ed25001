package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.idiv

/** Prefix-filtered exact set-similarity self-join (the SSJoin/PPJoin family:
  * Chaudhuri-Ganti-Kaushik ICDE'06; Xiao-Wang-Lin-Yu WWW'08) — the THIRD
  * candidate-generation strategy in the dedup toolbox, complementing
  * MinHash-LSH (q32, probabilistic) and SimHash (q33, Hamming buckets):
  * prefix filtering is EXACT — zero false negatives by construction — so the
  * result is the full Jaccard-≥θ pair set without a verification oracle.
  *
  * How: sort every record's distinct-token set by one global token order
  * (document frequency ascending, token ascending — rarest first, the
  * classic heuristic that minimizes candidates; ANY consistent total order
  * preserves correctness). Two sets with Jaccard ≥ θ = n/d must overlap
  * within their first `|s| - ceil(θ·|s|) + 1` tokens under a shared order
  * (pigeonhole), so exploding only that prefix and equi-joining on the token
  * generates a candidate superset; a per-pair exact intersection then
  * verifies. The length filter θ·|a| ≤ |b| ∧ θ·|b| ≤ |a| prunes candidates
  * whose sizes alone cap Jaccard below θ. All thresholds are integer
  * cross-multiplications — no floats anywhere.
  *
  * Scale shape (100 TB): token DF is one postings-sized aggregate; the
  * per-record sort is partition-local (collect_list + array_sort inside one
  * row); candidates come from an EQUI-join on prefix tokens (never
  * all-pairs); verification joins arrays back BY ID so doc-sized payloads
  * cross the exchange once per surviving candidate, not once per posting.
  * Skewed prefix tokens (stopword-like) are exactly what the rarest-first
  * order avoids; a residual hot token salts like any skewed equi-join.
  */
object SetSimJoin {

  /** All pairs (id1 < id2) whose distinct-token Jaccard ≥ thetaNum/thetaDen.
    *
    * @param recs   (id BIGINT, toks ARRAY<STRING>) — token lists, duplicates ok
    * @return (id1, id2, inter, s1, s2, jac_ppm) — exact counts + floor-ppm
    */
  def selfJoin(recs: DataFrame, idCol: String, toksCol: String,
      thetaNum: Int, thetaDen: Int): DataFrame = {
    require(thetaNum > 0 && thetaNum <= thetaDen, s"bad theta $thetaNum/$thetaDen")
    // base and pref both feed SELF-joins below: without materialization each
    // join branch would re-execute the whole prep subplan (tokenize + df
    // join + per-record sort) — 6 corpus scans instead of 2. persist() makes
    // every branch read the one computed copy (MEMORY_AND_DISK: spills, no
    // recompute-on-eviction surprises at scale).
    val base = recs
      .select(col(idCol).cast("long").as("sid"), array_distinct(col(toksCol)).as("tk"))
      .withColumn("s", size(col("tk")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Global token order: (df asc, tok asc), attached by one equi-join on
    // the token — postings-sized, the same shuffle LSH banding pays.
    val toks = base.select(col("sid"), explode(col("tk")).as("tok"))
    val dfTab = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ordered = toks.join(dfTab, "tok")
      .groupBy(col("sid"))
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ord"))
      .select(col("sid"), expr("transform(ord, x -> x.tok)").as("ord"))

    // Prefix length ℓ = s - ceil(θ·s) + 1, integral: ceil(n·s/d) = (n·s+d-1) div d.
    val pref = ordered
      .withColumn("s", size(col("ord")).cast("long"))
      .withColumn("plen",
        col("s") - idiv(lit(thetaNum.toLong) * col("s") + lit(thetaDen - 1L), lit(thetaDen.toLong)) + lit(1L))
      .select(col("sid"), col("s"), explode(expr("slice(ord, 1, int(plen))")).as("ptok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Candidates: equi-join on a shared prefix token + the length filter.
    val cand = pref.as("a").join(pref.as("b"),
        col("a.ptok") === col("b.ptok") && col("a.sid") < col("b.sid") &&
          lit(thetaNum.toLong) * col("a.s") <= lit(thetaDen.toLong) * col("b.s") &&
          lit(thetaNum.toLong) * col("b.s") <= lit(thetaDen.toLong) * col("a.s"))
      .select(col("a.sid").as("id1"), col("b.sid").as("id2"))
      .dropDuplicates("id1", "id2")

    // Verify: exact intersection via the token arrays, joined back BY ID so
    // arrays ride the exchange once per candidate.
    val sets = base.select(col("sid"), col("tk"), col("s"))
    cand
      .join(sets.select(col("sid").as("id1"), col("tk").as("tk1"), col("s").as("s1")), "id1")
      .join(sets.select(col("sid").as("id2"), col("tk").as("tk2"), col("s").as("s2")), "id2")
      .withColumn("inter", size(array_intersect(col("tk1"), col("tk2"))).cast("long"))
      .where(lit(thetaDen.toLong) * col("inter") >=
        lit(thetaNum.toLong) * (col("s1") + col("s2") - col("inter")))
      .select(col("id1"), col("id2"), col("inter"), col("s1"), col("s2"),
        idiv(col("inter") * lit(1000000L), col("s1") + col("s2") - col("inter")).as("jac_ppm"))
  }

  /** DIRECTED exact containment join: all ordered pairs (a, b), a ≠ b, with
    * |A∩B| ≥ ⌈θ·|A|⌉ — "a is θ-contained in b". The asymmetric cousin of
    * [[selfJoin]] and the right primitive for QUOTE/SUBSET duplicate
    * detection in a curation cascade (a short doc embedded in a long one
    * has low Jaccard but full containment — Jaccard-based stages are
    * structurally blind to it).
    *
    * Exactness (pigeonhole, asymmetric form): under any shared total token
    * order, if none of A's first |A| − ⌈θ|A|⌉ + 1 tokens hits B, the
    * at-most-(⌈θ|A|⌉ − 1) remaining tokens cannot reach the required
    * intersection — so probing ONLY A's prefix against B's FULL postings
    * list generates a candidate superset with zero false negatives. The
    * probe side explodes a prefix; the build side is the ordinary inverted
    * list; the join stays EQUI on the token. Length filter: |B| ≥ ⌈θ|A|⌉.
    */
  def containmentJoin(recs: DataFrame, idCol: String, toksCol: String,
      thetaNum: Int, thetaDen: Int): DataFrame = {
    require(thetaNum > 0 && thetaNum <= thetaDen, s"bad theta $thetaNum/$thetaDen")
    val base = recs
      .select(col(idCol).cast("long").as("sid"), array_distinct(col(toksCol)).as("tk"))
      .withColumn("s", size(col("tk")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val toks = base.select(col("sid"), explode(col("tk")).as("tok"))
    val dfTab = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ordered = toks.join(dfTab, "tok")
      .groupBy(col("sid"))
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ord"))
      .select(col("sid"), expr("transform(ord, x -> x.tok)").as("ord"))

    // required intersection t = ceil(θ·s); probe prefix ℓ = s − t + 1
    val pref = ordered
      .withColumn("s", size(col("ord")).cast("long"))
      .withColumn("t",
        idiv(lit(thetaNum.toLong) * col("s") + lit(thetaDen - 1L), lit(thetaDen.toLong)))
      .select(col("sid"), col("s"), col("t"),
        explode(expr("slice(ord, 1, int(s - t + 1))")).as("ptok"))

    val cand = pref.as("a").join(
        toks.select(col("sid").as("bid"), col("tok").as("ptok")).as("b"),
        Seq("ptok"))
      .where(col("a.sid") =!= col("bid"))
      .select(col("a.sid").as("id_a"), col("bid").as("id_b"), col("t"))
      .dropDuplicates("id_a", "id_b")

    val sets = base.select(col("sid"), col("tk"), col("s"))
    cand
      .join(sets.select(col("sid").as("id_a"), col("tk").as("tka"), col("s").as("sa")), "id_a")
      .join(sets.select(col("sid").as("id_b"), col("tk").as("tkb"), col("s").as("sb")), "id_b")
      .where(col("sb") >= col("t"))
      .withColumn("inter", size(array_intersect(col("tka"), col("tkb"))).cast("long"))
      .where(col("inter") >= col("t"))
      .select(col("id_a"), col("id_b"), col("inter"), col("sa"), col("sb"),
        idiv(col("inter") * lit(1000000L), col("sa")).as("cont_ppm"))
  }
}
