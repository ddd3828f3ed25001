package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.idiv
import graft.functions.TextFunctions.tokens
import graft.model.Tables
import graft.operators.PageRank
import Protocol._

/** Retrieval-and-relevance operators ([EXT], SURVEY §2.2): BM25 ranked
  * search over the document corpus, collocation mining (PMI-ranked
  * bigrams), and weighted PageRank over the customer→supplier trade graph.
  * All three follow the q72 integer-micro discipline — every division is an
  * integral floor-division on BIGINTs, so sums are order-insensitive and the
  * DuckDB oracle is bit-exact with no float in sight.
  */
object RetrievalQueries extends QueryModule {

  /** The fixed keyword query for q134 (terms present across the corpus). */
  private val bmTerms = Seq("spark", "join", "stream")

  /** BM25 score_micro per matching doc (shared by q134 top-k and q168 RRF).
    * One postings-sized explode with the term filter applied map-side, df
    * via an unordered window over the postings (never a join-back — that
    * would re-run the text scan), corpus stats a 1-row broadcast. The
    * scoring itself lives in `RetrievalIndex.bm25FromPostings` — ONE
    * implementation shared with the streaming maintained index (q258), so
    * their equality is equality of inputs, not of two transcriptions.
    */
  private def bm25Scores(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val withDl = Tables.load(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"), size(col("tk")).cast("long").as("dl"))
    val stats = withDl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
    val tc = withDl.select(col("doc_id"), col("dl"), explode(col("tk")).as("t"))
      .where(col("t").isin(bmTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("t")).agg(count(lit(1)).as("c"))
    graft.streaming.RetrievalIndex.bm25FromPostings(tc, stats)
  }

  /** Oracle twin of [[bm25Scores]]: CTE chain ending in `bm(doc_id, score_micro)`. */
  private val bmScoreSql =
    s"""d AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
       |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM d),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS t_tokens FROM dl),
       |tc AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
       |       FROM (SELECT doc_id, unnest(tk) AS t FROM d)
       |       WHERE t IN (${bmTerms.map(t => s"'$t'").mkString(", ")})
       |       GROUP BY doc_id, t),
       |dft AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tc GROUP BY t),
       |sc AS (SELECT tc.doc_id,
       |   ((2*st.n_docs - 2*dft.df + 1)*1000000) // (2*dft.df + 1) AS idf2,
       |   (22*tc.c*st.t_tokens*1000000) // (10*tc.c*st.t_tokens + 3*st.t_tokens + 9*dl.dl*st.n_docs) AS tfpart
       |   FROM tc JOIN dl USING (doc_id) JOIN dft USING (t) CROSS JOIN st),
       |bm AS (SELECT doc_id, CAST(SUM((idf2*tfpart) // 1000000) AS BIGINT) AS score_micro
       |       FROM sc GROUP BY doc_id)""".stripMargin

  override val declared: Seq[Declared] = Seq(

    // q134 — BM25 top-10 (k1=1.2, b=0.75): the classic lexical ranking an
    // inverted-index search serves. Rational rearrangement keeps the whole
    // score in BIGINT micro-units:
    //   tf-part  = tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
    //            = 22·c·T div (10·c·T + 3·T + 9·dl·N)      [avgdl = T/N]
    //   idf      = (N-df+½)/(df+½) = (2N-2df+1) div' (2df+1)  (×10⁶, floored)
    // Term scores floor-multiply then SUM per doc — order-free. ln() of the
    // rational idf is monotone, so the ranking equals textbook BM25 whenever
    // df's are distinct. Width: 22·c·T·10⁶ < 2⁶³ ⇔ c·T < 4.2e11 — lift to
    // DECIMAL(38,0)/HUGEINT past ~10¹¹ corpus tokens (q72's same bound).
    //
    // Shape at 100 TB: tc is one explode with the term filter applied
    // BEFORE the aggregate (map-side, postings-sized); df and corpus stats
    // are term-count- and 1-row-sized broadcasts; the final top-10 is
    // TakeOrderedAndProject, never a global sort.
    Declared("q134_bm25",
      (s, dir) => {
        bm25Scores(s, dir)
          .orderBy(col("score_micro").desc, col("doc_id"))
          .limit(10)
          .select(col("doc_id"), big(col("score_micro")).as("score_micro"))
      },
      Some(s"""WITH $bmScoreSql
              |SELECT doc_id, score_micro
              |FROM bm ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin)),

    // q258 — STREAMING BM25 over a MAINTAINED inverted index
    // (streaming.RetrievalIndex): the corpus ingests as 4 micro-batches
    // into a term-bucketed postings store + id sidecar + per-batch stats
    // feed, then the SAME fixed query runs against the maintained index.
    // Scoring is the one shared integer-micro implementation, so the
    // streamed answer is byte-identical to batch q134 — same oracle. At
    // 100 TB: ingest is batch-sized per batch (flat in corpus history,
    // RetrievalIndexSpec), the query reads only the matched terms' buckets
    // and its df window is exchange-free on the bucketed layout.
    Declared("q258_stream_bm25",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        val idxDir = SharedStages.scratchDir("q258") + "/idx"
        // bucket width = the session's partition width — the operator
        // default since round 11 (bucket-width law; the q255 lesson: a
        // store built at the gate's 8 buckets funnels the corpus-sized
        // postings write through 8 tasks at 100× the data)
        for (b <- 0L until 4L)
          graft.streaming.RetrievalIndex.ingestBatch(
            docs.filter(pmod(col("doc_id"), lit(4L)) === b), idxDir, b)
        graft.streaming.RetrievalIndex.bm25(s, idxDir, bmTerms, 10)
          .select(col("doc_id"), big(col("score_micro")).as("score_micro"))
          .orderBy(col("score_micro").desc, col("doc_id"))
      },
      Some(s"""WITH $bmScoreSql
              |SELECT doc_id, score_micro
              |FROM bm ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin)),

    // q135 — collocation mining: adjacent-bigram lift, the PMI workhorse of
    // phrase induction ("new york"-finding) in LLM-data tokenizer prep.
    // lift = p(ab)/(p(a)p(b)); corpus constants (Nb, Nu²) are dropped so
    // score_micro = c_ab·10¹² div (c_a·c_b) — ln-monotone in PMI up to the
    // shared constant ⇒ identical ranking, zero floats. Support floor
    // c_ab ≥ 5 (the standard PMI rare-pair guard). Width: c_ab < 9.2e6
    // before the 10¹² scale overflows — DECIMAL(38,0) lift past that.
    //
    // Shape at 100 TB: bigrams come from ONE pass (arrays_zip of the token
    // array with itself shifted — no self-join); both count maps are
    // map-side partial aggs; the unigram join keys are term-sized.
    Declared("q135_collocation",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents").select(tokens(col("text")).as("tk"))
        val uni = d.select(explode(col("tk")).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("c"))
        val bi = d.select(explode(arrays_zip(
            slice(col("tk"), lit(1), size(col("tk")) - 1),
            slice(col("tk"), lit(2), size(col("tk")) - 1))).as("p"))
          .select(col("p").getField("0").as("a"), col("p").getField("1").as("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
          .where(col("cab") >= 5)
        // melt-join-pivot: each bigram contributes one row per role, joined
        // against ONE unigram aggregate — two counter-sized shuffles instead
        // of a second full text scan for a duplicated uni subplan. min(when)
        // is safe for a==b bigrams (both roles resolve to the same count).
        val melted = bi.select(col("a"), col("b"), col("cab"),
          explode(array(col("a"), col("b"))).as("t"))
        val counted = melted.join(uni, "t")
          .groupBy(col("a"), col("b"), col("cab"))
          .agg(min(when(col("t") === col("a"), col("c"))).as("ca"),
            min(when(col("t") === col("b"), col("c"))).as("cb"))
        counted
          .select(col("a"), col("b"), big(col("cab")).as("cab"),
            idiv(col("cab") * lit(1000000000000L), col("ca") * col("cb")).as("lift_micro"))
          .orderBy(col("lift_micro").desc, col("a"), col("b"))
          .limit(20)
          .select(col("a"), col("b"), col("cab"), big(col("lift_micro")).as("lift_micro"))
      },
      Some("""WITH d AS (SELECT string_split(text,' ') AS tk FROM documents),
             |uni AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT unnest(tk) AS t FROM d) GROUP BY t),
             |bi AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab FROM
             |  (SELECT tk[i] AS a, tk[i+1] AS b
             |   FROM d CROSS JOIN UNNEST(range(1, len(tk))) AS t(i))
             |  GROUP BY a, b HAVING COUNT(*) >= 5)
             |SELECT bi.a, bi.b, bi.cab,
             |  CAST((bi.cab * 1000000000000) // (ua.c * ub.c) AS BIGINT) AS lift_micro
             |FROM bi JOIN uni ua ON ua.t = bi.a JOIN uni ub ON ub.t = bi.b
             |ORDER BY lift_micro DESC, a, b LIMIT 20""".stripMargin)),

    // q138 — weighted PageRank (3 rounds, d=0.85) over the nation-level
    // trade graph: edge (customer nation → supplier nation) weighted by
    // line-item count. The link-authority scorer of web-corpus curation,
    // here exercised end-to-end: graph extraction (3-way fact join) →
    // operators.PageRank (exact integer-micro recurrence, floor-then-sum —
    // see the operator scaladoc for the order-insensitivity argument) →
    // dimension join for names. The oracle unrolls the identical recurrence
    // three times in SQL.
    Declared("q138_pagerank",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        val su = Tables.load(s, dir, "supplier")
        val edges = l
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .groupBy(c("c_nationkey").as("src"), su("s_nationkey").as("dst"))
          .agg(count(lit(1)).as("w"))
        val pr = PageRank.run(edges, iters = 3)
        val nation = Tables.load(s, dir, "nation")
        pr.join(broadcast(nation), pr("v") === nation("n_nationkey"))
          .select(col("n_name"), big(col("pr")).as("pr_micro"))
          .orderBy(col("pr_micro").desc, col("n_name"))
      },
      Some {
        def it(prev: String, cur: String): String =
          s"""$cur AS (SELECT nd.v, (150000 // n.n_nodes) + COALESCE(c.s, 0) AS pr
             |  FROM nd CROSS JOIN n LEFT JOIN (
             |    SELECT e.dst AS v, CAST(SUM((17 * $prev.pr * e.w) // (20 * ow.ow)) AS BIGINT) AS s
             |    FROM $prev JOIN e ON $prev.v = e.src JOIN ow ON ow.src = e.src
             |    GROUP BY 1) c ON nd.v = c.v)""".stripMargin
        s"""WITH e AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, CAST(COUNT(*) AS BIGINT) AS w
           |  FROM lineitem l
           |  JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  JOIN customer c ON o.o_custkey = c.c_custkey
           |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
           |  GROUP BY 1, 2),
           |ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM e GROUP BY 1),
           |nd AS (SELECT DISTINCT src AS v FROM e UNION SELECT DISTINCT dst FROM e),
           |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nd),
           |pr0 AS (SELECT v, 1000000 // n_nodes AS pr FROM nd CROSS JOIN n),
           |${it("pr0", "pr1")},
           |${it("pr1", "pr2")},
           |${it("pr2", "pr3")}
           |SELECT na.n_name, CAST(pr3.pr AS BIGINT) AS pr_micro
           |FROM pr3 JOIN nation na ON na.n_nationkey = pr3.v
           |ORDER BY pr_micro DESC, n_name""".stripMargin
      }),

    // q164 — TRIANGLE COUNT + global clustering coefficient over the
    // co-purchase graph (parts sharing an order), via DEGREE-BASED
    // ORIENTATION (Suri & Vassilvitskii, WWW'11): direct every undirected
    // edge from its lower-(degree,id) endpoint to the higher, enumerate
    // wedges only at each edge's TAIL, and close them with one semi join.
    // Orientation bounds per-vertex out-degree by O(√m) on any graph, so
    // wedge generation is O(m^1.5) worst case instead of Σdeg² — the
    // difference between a hub vertex emitting deg² wedge rows and √m.
    // Every count is exact; clustering_ppm = 3·Δ·10⁶ div Σ C(deg,2).
    Declared("q164_triangles",
      (s, dir) => {
        // r13: the edge set is the shared materialized co-purchase stage
        // (SharedStages.copurchasePairs) — one landed self-join serves the
        // whole graph family instead of each query re-joining lineitem.
        // e feeds degree and orientation as cheap scans of the landed
        // file; oriented (a computed frame feeding both wedge branches
        // and the closing semi) keeps its persist.
        val e = SharedStages.copurchasePairs(s, dir)
          .select(col("pa").as("a"), col("pb").as("b"))
        val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("dg"))
        // unique, order-consistent orientation key: deg ⊕ vertex id
        // SHUFFLE_HASH on the degree side: deg is vertex-sized (scales with
        // the corpus — NEVER broadcast), but per-partition it hash-builds in
        // memory, so the hint trades two full sorts of the edge set for two
        // partition-local hash tables (guide §3.1: hash join over sort-merge
        // when one side is moderately small per partition).
        val ew = e
          .join(deg.select(col("v").as("a"), col("dg").as("da")).hint("shuffle_hash"), "a")
          .join(deg.select(col("v").as("b"), col("dg").as("db")).hint("shuffle_hash"), "b")
          .select(col("a"), col("b"),
            (col("da") * lit(10000000L) + col("a")).as("oa"),
            (col("db") * lit(10000000L) + col("b")).as("ob"))
        val oriented = ew.select(
          when(col("oa") < col("ob"), col("a")).otherwise(col("b")).as("u"),
          when(col("oa") < col("ob"), col("b")).otherwise(col("a")).as("v"),
          greatest(col("oa"), col("ob")).as("ov"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wedges = oriented.as("p").join(oriented.as("q"),
            col("p.u") === col("q.u") && col("p.ov") < col("q.ov"))
          .select(col("p.v").as("u"), col("q.v").as("v"))
        // The closing semi probes the WEDGE stream (≫ edges: O(m^1.5) rows)
        // against the edge set. SortMergeJoin sorted the whole wedge stream
        // first — the single most expensive operator in the suite (350 of
        // 415 task-s at sf0.1). SHUFFLE_HASH builds on the edge side
        // (per-partition edge slices, memory-safe at any scale because the
        // build is 1/N of the edge set) and streams wedges through unsorted.
        val tri = wedges
          .join(oriented.select(col("u"), col("v")).hint("shuffle_hash"),
            Seq("u", "v"), "left_semi")
          .agg(count(lit(1)).as("t"))
        val stats = deg.agg(
          count(lit(1)).as("n_vertices"),
          sum(col("dg")).as("deg_sum"),
          idiv(sum(col("dg") * (col("dg") - 1L)), lit(2L)).as("n_wedges"))
        tri.crossJoin(broadcast(stats))
          .select(
            big(col("n_vertices")).as("n_vertices"),
            idiv(col("deg_sum"), lit(2L)).as("n_edges"),
            big(col("n_wedges")).as("n_wedges"),
            big(col("t")).as("n_triangles"),
            idiv(lit(3L) * col("t") * lit(1000000L), col("n_wedges")).as("clustering_ppm"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
             |  FROM lineitem l1 JOIN lineitem l2
             |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
             |deg AS (SELECT v, COUNT(*) AS dg
             |        FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v),
             |tri AS (SELECT COUNT(*) AS t
             |        FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
             |        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
             |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
             |         CAST(SUM(dg) AS BIGINT) AS deg_sum,
             |         CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
             |SELECT st.n_vertices, st.deg_sum // 2 AS n_edges, st.n_wedges,
             |  CAST(tri.t AS BIGINT) AS n_triangles,
             |  3 * CAST(tri.t AS BIGINT) * 1000000 // st.n_wedges AS clustering_ppm
             |FROM st, tri""".stripMargin)),

    // q168 — RECIPROCAL RANK FUSION (Cormack-Clarke-Buettcher SIGIR'09):
    // fuse two retrievers' top-20 lists — BM25 (lexical, shared scorer with
    // q134) and a length prior (n_chars desc; the score-free second ranker
    // every hybrid-search stack has) — by RRF(d) = Σ 10⁶ div (60 + rank).
    // Classic rational RRF with the standard k=60, floor-division exact, so
    // the fusion is engine-identical with zero floats. Ranks are dense
    // row_numbers with total-order tie-breaks; docs outside a list simply
    // contribute nothing (FULL OUTER + null-armed contribution).
    //
    // Shape at 100 TB: each retriever's top-k is TakeOrderedAndProject
    // (never a global sort); ranking the two 20-row lists and fusing is
    // driver-trivial by construction (bounded by k, not corpus size).
    Declared("q168_rrf_fusion",
      (s, dir) => {
        val w20 = Window.orderBy(col("score_micro").desc, col("doc_id"))
        val wln = Window.orderBy(col("n_chars").desc, col("doc_id"))
        // rank-within-20: the limit(20) bounds the window's single
        // partition at 20 rows — sanctioned (k-sized, not corpus-sized).
        val aTop = bm25Scores(s, dir)
          .orderBy(col("score_micro").desc, col("doc_id")).limit(20)
          .withColumn("ra", row_number().over(w20)).select(col("doc_id"), col("ra"))
        val bTop = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"))
          .orderBy(col("n_chars").desc, col("doc_id")).limit(20)
          .withColumn("rb", row_number().over(wln)).select(col("doc_id"), col("rb"))
        aTop.join(bTop, Seq("doc_id"), "full_outer")
          .withColumn("fused_micro",
            coalesce(idiv(lit(1000000L), col("ra") + lit(60L)), lit(0L)) +
              coalesce(idiv(lit(1000000L), col("rb") + lit(60L)), lit(0L)))
          .orderBy(col("fused_micro").desc, col("doc_id"))
          .limit(10)
          .select(col("doc_id"), big(col("ra")).as("ra"), big(col("rb")).as("rb"),
            col("fused_micro"))
      },
      Some(s"""WITH $bmScoreSql,
              |ra AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT) AS ra
              |       FROM bm ORDER BY score_micro DESC, doc_id LIMIT 20),
              |rb AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rb
              |       FROM documents ORDER BY n_chars DESC, doc_id LIMIT 20)
              |SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id, ra, rb,
              |  COALESCE(1000000 // (ra + 60), 0) + COALESCE(1000000 // (rb + 60), 0) AS fused_micro
              |FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
              |ORDER BY fused_micro DESC, doc_id LIMIT 10""".stripMargin)))
}
