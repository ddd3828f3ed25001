package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  *
  * DICTIONARY ENCODING: the global order is materialized as an integer
  * token id — [[GlobalRank]] over the vocabulary table by (df, tok), a
  * vocab-sized range shuffle with no single-partition stage — and every
  * downstream structure (per-doc sorted arrays, prefix explode, candidate
  * equi-join, verify intersection) runs on ARRAY<BIGINT>/BIGINT, never
  * strings. The sf10 rehearsal measured the string form's verify stage at
  * ~23 µs per enumerated candidate (hashing ~100-element string arrays per
  * pair dominates); 8-byte longs cut the shuffled bytes and the intersect
  * cost by roughly the mean token length. Token strings never leave the
  * vocabulary aggregate.
  *
  * POSITIONAL filter (the PPJoin refinement, Xiao et al. WWW'08 §3): a
  * candidate-generating occurrence carries each side's position in its own
  * df-sorted order. Every common token of a qualifying pair is ≥ the
  * globally-FIRST common token w, so the overlap fits inside both suffixes
  * at w: I ≤ min(sa − posA(w), sb − posB(w)) (0-based pos). Since I ≥ t is
  * required, keeping only occurrences with suffix ≥ t on BOTH sides still
  * keeps w's occurrence for every true pair — zero false negatives — while
  * pruning hot-token candidates: a corpus-frequent token sorts LAST under
  * the df order, its suffix is tiny, and the quadratic df² candidate blowup
  * it would cause dies at generation. The sf1→sf10 rehearsal measured the
  * containment join's pre-filter form at 172× task time at 10× data; with
  * the filter + encoding the second decade re-ran ~linear.
  */
object SetSimJoin {

  /** Shared prep: distinct tokens → vocabulary df → integer token id (global
    * rank by (df asc, tok asc), scale-safe via [[GlobalRank]]) → per-record
    * SORTED id array. Returned frame: (sid BIGINT, ord ARRAY<BIGINT> sorted
    * ascending = rarest-first, s BIGINT). Persisted — every caller branches
    * off it at least twice (prefix/postings/verify); the CALLER's session
    * owns the release (clearCache per query, the Verify/Bench pattern).
    */
  private def encodeOrdered(recs: DataFrame, idCol: String, toksCol: String): DataFrame = {
    // base persists because `toks` feeds two jobs (the df aggregate inside
    // GlobalRank's eager rank materialization, then the ordered build) —
    // without it the tokenize subplan re-executes per job.
    val base = recs
      .select(col(idCol).cast("long").as("sid"), array_distinct(col(toksCol)).as("tk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val toks = base.select(col("sid"), explode(col("tk")).as("tok"))
    val dfTab = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // tid is INT, not LONG: the verify stage ships one id array per
    // candidate pair through two exchanges — at the rehearsal's sf10 that
    // array traffic dominates the whole join, so halving the element width
    // halves the dominant shuffle. A >2³¹-token vocabulary fails LOUDLY
    // here rather than wrapping (at that point the dictionary itself needs
    // a wider id; nothing downstream assumes int beyond this cast).
    val rankTab = GlobalRank.withRankColumns(dfTab, Seq(col("df"), col("tok")))
      .select(col("tok"),
        when(col("rank") > Int.MaxValue.toLong, raise_error(
          lit("SetSimJoin: vocabulary exceeds Int.MaxValue distinct tokens; widen tid to BIGINT")))
          .otherwise(col("rank").cast("int")).as("tid"))
    toks.join(rankTab, "tok")
      .groupBy(col("sid"))
      .agg(array_sort(collect_list(col("tid"))).as("ord"))
      .withColumn("s", size(col("ord")).cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** All pairs (id1 < id2) whose distinct-token Jaccard ≥ thetaNum/thetaDen.
    *
    * @param recs   (id BIGINT, toks ARRAY<STRING>) — token lists, duplicates ok
    * @return (id1, id2, inter, s1, s2, jac_ppm) — exact counts + floor-ppm
    */
  def selfJoin(recs: DataFrame, idCol: String, toksCol: String,
      thetaNum: Int, thetaDen: Int): DataFrame = {
    require(thetaNum > 0 && thetaNum <= thetaDen, s"bad theta $thetaNum/$thetaDen")
    val ordered = encodeOrdered(recs, idCol, toksCol)

    // Prefix length ℓ = s - ceil(θ·s) + 1, integral: ceil(n·s/d) = (n·s+d-1) div d.
    // posexplode keeps each prefix token's 0-based position for the
    // positional filter below (position-in-prefix == position-in-ord).
    // Persisted: both sides of the candidate self-join read it.
    val pref = ordered
      .withColumn("plen",
        col("s") - idiv(lit(thetaNum.toLong) * col("s") + lit(thetaDen - 1L), lit(thetaDen.toLong)) + lit(1L))
      .select(col("sid"), col("s"),
        posexplode(expr("slice(ord, 1, int(plen))")).as(Seq("p", "ptok")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Candidates: equi-join on a shared prefix token + the length filter +
    // the positional filter. Pair overlap bound t(a,b) = ceil(θ(s1+s2)/(1+θ))
    // = ceil(n(s1+s2)/(n+d)); the occurrence survives only if BOTH suffixes
    // at the shared token can still hold t — see the header proof.
    val tPair = idiv(
      lit(thetaNum.toLong) * (col("a.s") + col("b.s")) + lit((thetaNum + thetaDen - 1).toLong),
      lit((thetaNum + thetaDen).toLong))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.ptok") === col("b.ptok") && col("a.sid") < col("b.sid") &&
          lit(thetaNum.toLong) * col("a.s") <= lit(thetaDen.toLong) * col("b.s") &&
          lit(thetaNum.toLong) * col("b.s") <= lit(thetaDen.toLong) * col("a.s") &&
          col("a.s") - col("a.p") >= tPair &&
          col("b.s") - col("b.p") >= tPair)
      .select(col("a.sid").as("id1"), col("b.sid").as("id2"))
      .dropDuplicates("id1", "id2")

    // Verify: exact intersection via the SORTED ID arrays, joined back BY ID
    // so arrays ride the exchange once per candidate. |A∩B| on ids equals
    // |A∩B| on tokens (the id map is a bijection on the vocabulary);
    // SortedIntersectCount is the two-pointer merge count over the sorted
    // dictionaries — no per-pair hash set or intersection array.
    val sets = ordered.select(col("sid"), col("ord"), col("s"))
    cand
      .join(sets.select(col("sid").as("id1"), col("ord").as("tk1"), col("s").as("s1")), "id1")
      .join(sets.select(col("sid").as("id2"), col("ord").as("tk2"), col("s").as("s2")), "id2")
      .withColumn("inter", graft.functions.SortedIntersectCount(col("tk1"), col("tk2")))
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
    * list; the join stays EQUI on the token id.
    */
  def containmentJoin(recs: DataFrame, idCol: String, toksCol: String,
      thetaNum: Int, thetaDen: Int): DataFrame = {
    require(thetaNum > 0 && thetaNum <= thetaDen, s"bad theta $thetaNum/$thetaDen")
    val ordered = encodeOrdered(recs, idCol, toksCol)

    // required intersection t = ceil(θ·s); probe prefix ℓ = s − t + 1.
    // Positions (0-based, within each side's own df-sorted order) feed the
    // positional filter: all t common tokens sit at-or-after the globally
    // first shared token in BOTH orders, so an occurrence can only witness a
    // qualifying pair if suffix ≥ t on both sides (header proof) — this is
    // what keeps a corpus-frequent build-side token (sorted last, suffix ≈ 0)
    // from emitting its whole df² candidate square.
    val pref = ordered
      .withColumn("t",
        idiv(lit(thetaNum.toLong) * col("s") + lit(thetaDen - 1L), lit(thetaDen.toLong)))
      .select(col("sid"), col("s"), col("t"),
        posexplode(expr("slice(ord, 1, int(s - t + 1))")).as(Seq("i", "ptok")))

    // Build side: the FULL postings list of the df-sorted order (positions
    // included) — a narrow pass over the persisted `ordered`.
    val postings = ordered
      .select(col("sid").as("bid"), col("s").as("sb"),
        posexplode(col("ord")).as(Seq("j", "ptok")))

    val cand = pref.as("a").join(postings.as("b"), Seq("ptok"))
      .where(col("a.sid") =!= col("bid") &&
        col("s") - col("i") >= col("t") &&
        col("sb") - col("j") >= col("t"))
      .select(col("a.sid").as("id_a"), col("bid").as("id_b"), col("t"))
      .dropDuplicates("id_a", "id_b")

    val sets = ordered.select(col("sid"), col("ord"), col("s"))
    cand
      .join(sets.select(col("sid").as("id_a"), col("ord").as("tka"), col("s").as("sa")), "id_a")
      .join(sets.select(col("sid").as("id_b"), col("ord").as("tkb"), col("s").as("sb")), "id_b")
      .withColumn("inter", graft.functions.SortedIntersectCount(col("tka"), col("tkb")))
      .where(col("inter") >= col("t"))
      .select(col("id_a"), col("id_b"), col("inter"), col("sa"), col("sb"),
        idiv(col("inter") * lit(1000000L), col("sa")).as("cont_ppm"))
  }
}
