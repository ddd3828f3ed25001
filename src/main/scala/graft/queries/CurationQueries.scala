package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.{hexLong, idiv}
import graft.functions.TextFunctions._
import graft.model.Tables
import Protocol._

/** Corpus-curation operators (round 3): the steps a training-data pipeline
  * runs AFTER pair-level dedup — cluster formation, benchmark
  * decontamination, repetition/quality signals, PII-style scrubbing, domain
  * mixing, vocabulary building. Each is blocked/broadcast shaped so nothing
  * here is all-pairs or driver-materialized, and each has a bit-exact DuckDB
  * oracle.
  */
object CurationQueries extends QueryModule {

  /** DuckDB CTE chain ending at `cl(doc_id, rep)` — the oracle twin of
    * SharedStages.dedupClusters, shared verbatim by q60 and q67 so the two
    * can never drift on what a cluster is.
    */
  private val duckClusterCtes: String =
    "WITH RECURSIVE " + DedupQueries.duckSig.stripPrefix("WITH ") +
      s""",
        |near_pairs AS (${DedupQueries.duckPairsSelect}),
        |exact_pairs AS (
        |  SELECT m AS u, doc_id AS v FROM (
        |    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS m
        |    FROM documents) WHERE doc_id <> m),
        |edges AS (
        |  SELECT u, v FROM exact_pairs
        |  UNION SELECT v, u FROM exact_pairs
        |  UNION SELECT id_a, id_b FROM near_pairs
        |  UNION SELECT id_b, id_a FROM near_pairs),
        |reach(n, r) AS (
        |  SELECT DISTINCT u, u FROM edges
        |  UNION
        |  SELECT e.u, rch.r FROM edges e JOIN reach rch ON rch.n = e.v),
        |cl AS (SELECT n AS doc_id, MIN(r) AS rep FROM reach GROUP BY n)""".stripMargin

  /** The quality-aware keep rule shared by q67 and q82: per cluster, the
    * member with the most tokens (doc_id asc on ties), chosen with ONE
    * atomic max_by struct so id and token count always come from the same
    * member row. Returns (rep, best{n_tokens, nid=-keep_id}, cluster_size).
    */
  private def clusterBest(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val clusters = SharedStages.dedupClusters(s, dir)
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
    clusters.join(toks, "doc_id")
      .groupBy(col("rep"))
      .agg(
        max_by(struct(col("n_tokens"), (-col("doc_id")).as("nid")),
          struct(col("n_tokens"), (-col("doc_id")).as("nid"))).as("best"),
        big(count(lit(1))).as("cluster_size"))
  }

  override val declared: Seq[Declared] = Seq(

    // q60 — duplicate CLUSTERS from pair-level evidence: exact-dup edges
    // (same md5, star to the group min) ∪ MinHash-LSH near-dup pairs
    // (est_jaccard ≥ 0.5, shared lshNearPairs stage), resolved to connected
    // components so transitive chains a–b–c collapse to ONE representative.
    // Pairwise keep-first under-deletes exactly those chains; clusters are
    // what production dedup (e.g. the public C4/RefinedWeb recipes) keeps.
    // The cluster map is a materialized shared stage (SharedStages
    // .dedupClusters) consumed here and by q67.
    Declared("q60_dedup_clusters",
      (s, dir) => SharedStages.dedupClusters(s, dir).orderBy(col("doc_id")),
      Some(duckClusterCtes +
        "\nSELECT doc_id, rep FROM cl ORDER BY doc_id")),

    // q67 — quality-aware cluster REPRESENTATIVES: per near-dup cluster keep
    // the longest member (tokens desc, doc_id asc tiebreak) — the
    // keep-best-of-cluster step production dedup runs after cluster
    // formation (min-id keep-first throws away the best copy whenever the
    // shortest crawl happens to have the smallest id). One equi-join of the
    // cluster map to per-doc token counts, one hash-agg with an atomic
    // max_by struct — both map-side combinable, nothing all-pairs.
    // The keep rule lives in [[clusterBest]], shared verbatim with q82 so
    // the two declared queries can never drift on what a representative is.
    Declared("q67_cluster_reps",
      (s, dir) => {
        clusterBest(s, dir)
          .select(col("rep"), (-col("best.nid")).as("keep_id"),
            big(col("best.n_tokens")).as("keep_tokens"), col("cluster_size"))
          .orderBy(col("rep"))
      },
      Some(duckClusterCtes +
        """,
          |j AS (SELECT cl.rep, cl.doc_id, len(string_split(d.text, ' ')) AS n_tokens
          |  FROM cl JOIN documents d ON d.doc_id = cl.doc_id),
          |rk AS (SELECT rep, doc_id, n_tokens,
          |  ROW_NUMBER() OVER (PARTITION BY rep ORDER BY n_tokens DESC, doc_id) AS rn,
          |  COUNT(*) OVER (PARTITION BY rep) AS csz
          |  FROM j)
          |SELECT rep, doc_id AS keep_id, CAST(n_tokens AS BIGINT) AS keep_tokens,
          |  CAST(csz AS BIGINT) AS cluster_size
          |FROM rk WHERE rn = 1 ORDER BY rep""".stripMargin)),

    // q68 — sequence PACKING: assign documents to fixed-capacity context
    // bins (1024 tokens) by cumulative token count in doc_id order — the
    // standard cumsum approximation of greedy sample packing (each doc
    // lands in the bin its running total starts in; a boundary-spanning doc
    // overflows its bin by < one doc, which the trainer's chunker absorbs).
    // The global running sum is GlobalCumSum — range-partitioned prefix
    // sums + a broadcast offset map, NO single-partition window stage.
    Declared("q68_seq_packing",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
        graft.operators.GlobalCumSum
          .withCumSum(toks, Seq(col("doc_id")), col("n_tokens"), "cum")
          .withColumn("bin", idiv(col("cum") - col("n_tokens"), lit(1024L)))
          .groupBy(col("bin"))
          .agg(big(count(lit(1))).as("n_docs"), big(sum(col("n_tokens"))).as("bin_tokens"))
          .orderBy(col("bin"))
      },
      Some("""WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
             |c AS (SELECT doc_id, n,
             |  SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM d)
             |SELECT CAST((cum - n) // 1024 AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n) AS BIGINT) AS bin_tokens
             |FROM c GROUP BY bin ORDER BY bin""".stripMargin)),

    // q61 — benchmark DECONTAMINATION (operators.Decontaminate): flag
    // training documents sharing any token n-gram with the held-out eval
    // set (stand-in: source = 'src0'). The eval shingle set is tiny by
    // construction → broadcast inner join; the training side streams
    // through map-side, nothing all-pairs. The fixture config is width 3
    // over the materialized shared shingle stage (the 10-99-token synthetic
    // docs are too short for the production width-13 GPT-3/FLAN default,
    // which CurationSpec exercises on a synthetic eval set).
    Declared("q61_decontaminate",
      (s, dir) => {
        val sh = SharedStages.docShingles(s, dir)
          .select(col("doc_id"), col("source"), col("sh"))
        graft.operators.Decontaminate.fromShingles(
            sh.filter(col("source") =!= "src0"),
            sh.filter(col("source") === "src0"))
          .select(col("doc_id"), big(col("n_hits")).as("n_hits"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, source, text, string_split(text, ' ') AS tk FROM documents),
             |sh AS (SELECT doc_id, source,
             |  CASE WHEN len(tk) >= 3
             |    THEN list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             |    ELSE [text] END AS sh FROM d),
             |fl AS (SELECT doc_id, source, unnest(sh) AS s FROM sh),
             |ev AS (SELECT DISTINCT s FROM fl WHERE source = 'src0')
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
             |FROM fl JOIN ev USING (s) WHERE source <> 'src0'
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // q62 — repetition quality signals per document (Gopher-rule shape):
    // duplicate-3-gram fraction and top-token frequency fraction. Both are
    // explode → hash-aggregate (partial map-side), shuffling one counter row
    // per (doc, token) — never the text.
    Declared("q62_repetition",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val base = docs.select(col("doc_id"),
            size(tokens(col("text"))).as("n_tokens"),
            size(shingles3(col("text"))).as("n_sh"),
            size(shingles3Distinct(col("text"))).as("n_dist"))
        val topTok = docs
          .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("max_c"))
        base.join(topTok, "doc_id")
          .select(col("doc_id"),
            big(col("n_tokens")).as("n_tokens"),
            out6(lit(1) - dec(col("n_dist")) / col("n_sh")).as("dup_3gram_frac"),
            out6(dec(col("max_c")) / col("n_tokens")).as("top_token_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
             |s AS (SELECT doc_id, len(tk) AS n_tokens,
             |  CASE WHEN len(tk) >= 3
             |    THEN list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))
             |    ELSE [text] END AS sh FROM d),
             |b AS (SELECT doc_id, n_tokens, len(sh) AS n_sh, len(list_distinct(sh)) AS n_dist FROM s),
             |t AS (SELECT doc_id, MAX(c) AS max_c FROM (
             |  SELECT doc_id, t, COUNT(*) AS c FROM (SELECT doc_id, unnest(tk) AS t FROM d)
             |  GROUP BY doc_id, t) GROUP BY doc_id)
             |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
             |  CAST(ROUND(1 - CAST(n_dist AS DECIMAL(18,6)) / n_sh, 6) AS DECIMAL(18,6)) AS dup_3gram_frac,
             |  CAST(ROUND(CAST(max_c AS DECIMAL(18,6)) / b.n_tokens, 6) AS DECIMAL(18,6)) AS top_token_frac
             |FROM b JOIN t USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // q63 — PII-style pattern scrub over the events stream's JSON props:
    // count pattern matches and distinct post-redaction shapes per event
    // type. The digit-run pattern stands in for phone/SSN/account patterns —
    // the operator (regexp_count + regexp_replace inside codegen, then
    // hash-agg) is the production shape; patterns are config. Both regex
    // dialects (Java here, RE2 in the oracle) agree on this pattern class.
    Declared("q63_pii_scrub",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .select(col("event_type"),
            regexp_count(col("props"), lit("[0-9]+")).as("n_runs"),
            regexp_replace(col("props"), "[0-9]+", "<NUM>").as("red"))
          .groupBy(col("event_type"))
          .agg(big(sum(col("n_runs"))).as("n_numeric_runs"),
            big(countDistinct(col("red"))).as("n_distinct_redacted"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_numeric_runs,
             |  CAST(COUNT(DISTINCT regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS BIGINT) AS n_distinct_redacted
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // q64 — domain MIXING: deterministic down-sampling of over-represented
    // sources toward a per-source target of total/(2·n_sources). Keep rule is
    // pure integer arithmetic on an md5-uniform of doc_id —
    // (h mod 10⁶)·cnt_s < target·10⁶ ⇔ u < min(1, target/cnt_s) — so the
    // sample is a pure function of the data (reproducible across engines,
    // retries, and partitionings; no RNG state). Two passes: per-source
    // counts (tiny → broadcast), then one map-side filter + count.
    Declared("q64_domain_mix",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val cnt = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        val target = cnt
          .agg(sum(col("n_docs")).as("tot"), count(lit(1)).as("nsrc"))
          .select(idiv(col("tot"), lit(2) * col("nsrc")).as("target"))
        val kept = docs
          .join(broadcast(cnt), "source")
          .crossJoin(broadcast(target))
          .filter(
            (hexLong(md5(col("doc_id").cast("string")), 1, 15) % 1000000L)
              * col("n_docs") < col("target") * 1000000L)
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
        cnt.join(kept, Seq("source"), "left")
          .select(col("source"), big(col("n_docs")).as("n_docs"),
            big(coalesce(col("n_kept"), lit(0L))).as("n_kept"))
          .orderBy(col("source"))
      },
      Some("""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
             |t AS (SELECT SUM(n_docs) // (2 * COUNT(*)) AS target FROM c),
             |k AS (SELECT d.source, COUNT(*) AS n_kept
             |  FROM documents d JOIN c ON c.source = d.source CROSS JOIN t
             |  WHERE (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000)
             |        * c.n_docs < t.target * 1000000
             |  GROUP BY d.source)
             |SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs,
             |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
             |FROM c LEFT JOIN k ON k.source = c.source
             |ORDER BY c.source""".stripMargin)),

    // q65 — vocabulary building: token document frequency, top 50 with a
    // total-order tie-break. Distinct-tokens-per-doc explode → partial
    // count map-side → TakeOrderedAndProject; the full vocabulary never
    // lands on one node.
    Declared("q65_vocab_df",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(explode(array_distinct(tokens(col("text")))).as("token"))
          .groupBy(col("token")).agg(big(count(lit(1))).as("df"))
          .orderBy(col("df").desc, col("token"))
          .limit(50)
      },
      Some("""SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM (
             |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
             |  FROM documents)
             |GROUP BY token ORDER BY df DESC, token LIMIT 50""".stripMargin)),

    // q82 — the END-TO-END curated corpus: drop LOSING duplicate-cluster
    // members (everyone but the q67 representative — documents with no
    // duplicate evidence are never in the cluster map and are KEPT), then
    // drop decontamination hits (q61's operator) and quality failures;
    // report per-source yield. This is the whole curation pipeline as ONE
    // declared query — a user keeps exactly the docs this emits.
    // Composition notes: the cluster map and shingle stage are the
    // SharedStages artifacts (computed once, read here) and the keep rule
    // is [[clusterBest]], shared verbatim with q67; the quality thresholds
    // are INTEGER-only comparisons (5·(n_sh−n_dist) < 2·n_sh encodes
    // dup_3gram_frac < 0.4 without a division — the gate protocol's
    // halfway-rounding hazard never arises); kept = anti-join on the
    // cluster losers, anti-join on contaminated.
    Declared("q82_curated_corpus",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val metrics = docs.select(col("doc_id"), col("source"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          size(shingles3(col("text"))).as("n_sh"),
          size(shingles3Distinct(col("text"))).as("n_dist"))
        // losers = cluster members that are NOT their cluster's
        // representative; unique docs never appear in the cluster map and
        // therefore never in this drop set
        val keepers = clusterBest(s, dir).select((-col("best.nid")).as("doc_id"))
        val losers = SharedStages.dedupClusters(s, dir).select(col("doc_id"))
          .join(keepers, Seq("doc_id"), "left_anti")
        // Contamination at the fixture's width-3 shingles is NOISY (short
        // synthetic docs share stray trigrams with the eval stand-in —
        // any-hit flags 84% of the corpus), so the composed pipeline drops
        // only the genuine tail: n_hits >= 10 (p99 of the per-doc hit
        // distribution). At the production width-13 default (q61 operator
        // doc), any hit is disqualifying and this threshold drops to 1.
        val sh = SharedStages.docShingles(s, dir)
          .select(col("doc_id"), col("source"), col("sh"))
        val contaminated = graft.operators.Decontaminate.fromShingles(
            sh.filter(col("source") =!= "src0"), sh.filter(col("source") === "src0"))
          .filter(col("n_hits") >= 10)
          .select(col("doc_id"))
        metrics
          .join(losers, Seq("doc_id"), "left_anti")
          .join(contaminated, Seq("doc_id"), "left_anti")
          .filter(col("source") =!= "src0")
          .filter(col("n_tokens") >= 12 &&
            lit(5) * (col("n_sh") - col("n_dist")) < lit(2) * col("n_sh"))
          .groupBy(col("source"))
          .agg(big(count(lit(1))).as("n_kept"), big(sum(col("n_tokens"))).as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some(duckClusterCtes +
        """,
          |j2 AS (SELECT cl.rep, cl.doc_id, len(string_split(d.text, ' ')) AS nt
          |  FROM cl JOIN documents d ON d.doc_id = cl.doc_id),
          |rk2 AS (SELECT rep, doc_id,
          |  ROW_NUMBER() OVER (PARTITION BY rep ORDER BY nt DESC, doc_id) AS rn FROM j2),
          |losers AS (SELECT doc_id FROM rk2 WHERE rn > 1),
          |dd AS (SELECT doc_id, source, text, string_split(text, ' ') AS tk FROM documents),
          |shf AS (SELECT doc_id, source, unnest(CASE WHEN len(tk) >= 3
          |    THEN list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
          |    ELSE [text] END) AS s FROM dd),
          |ev2 AS (SELECT DISTINCT s FROM shf WHERE source = 'src0'),
          |cont AS (SELECT shf.doc_id FROM shf JOIN ev2 USING (s) WHERE source <> 'src0'
          |  GROUP BY shf.doc_id HAVING COUNT(*) >= 10),
          |m AS (SELECT doc_id, source, len(tk) AS n_tokens,
          |  CASE WHEN len(tk) >= 3 THEN len(tk) - 2 ELSE 1 END AS n_sh,
          |  CASE WHEN len(tk) >= 3
          |    THEN len(list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))))
          |    ELSE 1 END AS n_dist
          |  FROM dd)
          |SELECT m.source, CAST(COUNT(*) AS BIGINT) AS n_kept,
          |  CAST(SUM(m.n_tokens) AS BIGINT) AS kept_tokens
          |FROM m
          |LEFT JOIN losers ON losers.doc_id = m.doc_id
          |LEFT JOIN cont ON cont.doc_id = m.doc_id
          |WHERE losers.doc_id IS NULL AND cont.doc_id IS NULL AND m.source <> 'src0'
          |  AND m.n_tokens >= 12 AND 5 * (m.n_sh - m.n_dist) < 2 * m.n_sh
          |GROUP BY m.source ORDER BY m.source""".stripMargin)),

    // q83 — SPLIT-LEAKAGE audit: assign every document to a deterministic
    // 80/10/10 train/val/test split (q50's md5-bucket rule on a salted
    // doc key), then count DUPLICATE-EVIDENCE pairs (exact md5 stars ∪ LSH
    // near-dup pairs — q60's edge set) whose endpoints land in DIFFERENT
    // splits. Cross-split duplicates are evaluation leakage: a val/test
    // doc whose near-copy sits in train inflates every metric. Production
    // recipes split by CLUSTER for exactly this reason; this query is the
    // audit that proves whether a split needs that. Pair evidence comes
    // from the materialized SharedStages pair stage (no recompute); split
    // assignment is a codegen'd md5 bucket; the leak matrix is a tiny agg.
    Declared("q83_split_leakage",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val bucket = hexLong(md5(concat(lit("doc:"), col("doc_id").cast("string"))), 1, 8) % 100
        val splits = docs.select(col("doc_id"),
          when(bucket < 80, lit("train")).when(bucket < 90, lit("val"))
            .otherwise(lit("test")).as("split"))
        val grpMin = min(col("doc_id")).over(Window.partitionBy(md5(col("text"))))
        val exactPairs = docs.select(grpMin.as("u"), col("doc_id").as("v"))
          .filter(col("u") =!= col("v"))
        val nearPairs = SharedStages.lshPairs(s, dir)
          .select(col("id_a").as("u"), col("id_b").as("v"))
        exactPairs.unionByName(nearPairs).distinct()
          .join(splits.toDF("u", "split_u"), "u")
          .join(splits.toDF("v", "split_v"), "v")
          .select(least(col("split_u"), col("split_v")).as("split_a"),
            greatest(col("split_u"), col("split_v")).as("split_b"))
          .groupBy(col("split_a"), col("split_b"))
          .agg(big(count(lit(1))).as("n_dup_pairs"))
          .orderBy(col("split_a"), col("split_b"))
      },
      Some(DedupQueries.duckSig +
        """,
          |near_pairs AS (""".stripMargin + DedupQueries.duckPairsSelect +
        """),
          |exact_pairs AS (
          |  SELECT m AS u, doc_id AS v FROM (
          |    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS m
          |    FROM documents) WHERE doc_id <> m),
          |pairs AS (SELECT u, v FROM exact_pairs UNION SELECT id_a, id_b FROM near_pairs),
          |sp AS (SELECT doc_id,
          |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
          |  FROM (SELECT doc_id,
          |    CAST(('0x' || substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
          |  FROM documents))
          |SELECT least(a.split, b.split) AS split_a, greatest(a.split, b.split) AS split_b,
          |  CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
          |FROM pairs p JOIN sp a ON a.doc_id = p.u JOIN sp b ON b.doc_id = p.v
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // q91 — BOILERPLATE REMOVAL as a document REWRITE (the CCNet/
    // RefinedWeb-style cleanup): words whose document frequency exceeds
    // 80% of the corpus (df·5 > N·4 — integer comparison, no division;
    // the fixture vocabulary is ~40 words, so production's lower cutoffs
    // would dissolve most synthetic docs outright)
    // are boilerplate; every document is re-emitted with those words
    // removed, ORIGINAL ORDER PRESERVED. The md5 of the rebuilt text pins
    // the reassembly byte-for-byte — a wrong position sort or a dropped
    // word breaks the hash. A document of pure boilerplate disappears (no
    // kept words), consistently on both sides.
    //
    // Scale shape: one exploded pass feeds both the DF table (distinct +
    // count, map-side combinable) and the rewrite; the boilerplate set is
    // vocabulary-bounded → broadcast anti-join; reassembly is a per-doc
    // hash agg (collect_list bounded by document length, the same bound
    // the text column itself already imposes on a row).
    Declared("q91_boilerplate_scrub",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val words = docs.select(col("doc_id"),
          posexplode(tokens(col("text"))).as(Seq("pos", "word")))
        val df = words.select(col("doc_id"), col("word")).distinct()
          .groupBy(col("word")).agg(count(lit(1)).as("df"))
        val totals = docs.agg(count(lit(1)).as("n_docs"))
        val boiler = df.crossJoin(broadcast(totals))
          .filter(col("df") * 5 > col("n_docs") * 4)
          .select(col("word"))
        words.join(broadcast(boiler), Seq("word"), "left_anti")
          .groupBy(col("doc_id"))
          .agg(big(count(lit(1))).as("n_kept"),
            md5(concat_ws(" ",
              transform(array_sort(collect_list(struct(col("pos"), col("word")))),
                x => x.getField("word")))).as("scrubbed_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
             |w AS (SELECT doc_id,
             |        unnest(list_transform(string_split(text, ' '),
             |                              (x, i) -> {'word': x, 'ord': i})) AS t
             |      FROM documents),
             |wo AS (SELECT doc_id, t.word AS word, t.ord AS ord FROM w),
             |bp AS (SELECT word FROM (SELECT word, COUNT(DISTINCT doc_id) AS df
             |                         FROM wo GROUP BY word), n
             |       WHERE df * 5 > n_docs * 4)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             |  md5(string_agg(word, ' ' ORDER BY ord)) AS scrubbed_md5
             |FROM wo WHERE word NOT IN (SELECT word FROM bp)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // q95 — TOKEN-BUDGET CORPUS SELECTION: rank every document by a
    // deterministic integer quality score (type-token ratio in ppm,
    // tie-broken by doc_id), then take the best documents whose RUNNING
    // token total fits a global budget (60% of the corpus) — the
    // "pick the best N tokens" selection step that follows scoring in a
    // training-data pipeline. The running total is GlobalCumSum (one range
    // shuffle + per-partition prefix sums + broadcast offsets — never a
    // single-partition window), the budget scalar is a 1-row broadcast, and
    // the verdict is per-source yield. All arithmetic is integral: ppm
    // scores and floor-div budgets are engine-portable where a double sort
    // key would not be.
    Declared("q95_token_budget",
      (s, dir) => {
        val t = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("n"),
            size(array_distinct(tokens(col("text")))).cast("long").as("n_types"))
          .withColumn("q_ppm", idiv(col("n_types") * lit(1000000L), col("n")))
        val ranked = graft.operators.GlobalCumSum
          .withCumSum(t, Seq(col("q_ppm").desc, col("doc_id")), col("n"), "cum")
        // budget = 60% of total tokens, derived from the LAST running total
        // (max cum) — reads GlobalCumSum's persisted pass instead of paying
        // the tokenize-and-score scan a second time
        val budget = ranked.agg(idiv(max(col("cum")) * lit(6L), lit(10L)).as("budget"))
        ranked
          .crossJoin(broadcast(budget))
          .filter(col("cum") <= col("budget"))
          .groupBy(col("source"))
          .agg(big(count(lit(1))).as("n_docs"), big(sum(col("n"))).as("sel_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n,
             |  (len(list_distinct(string_split(text, ' '))) * 1000000) // len(string_split(text, ' ')) AS q_ppm
             |  FROM documents),
             |b AS (SELECT (SUM(n) * 6) // 10 AS budget FROM t),
             |c AS (SELECT source, n,
             |  SUM(n) OVER (ORDER BY q_ppm DESC, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM t)
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n) AS BIGINT) AS sel_tokens
             |FROM c, b WHERE cum <= budget GROUP BY source ORDER BY source""".stripMargin)),

    // q108 — Unicode NFC cleanup (codegen'd NfcNormalize expression): web
    // corpora mix precomposed and combining-sequence encodings of the same
    // visible text, which silently defeats byte-level dedup/fingerprints.
    // The fixture text is ASCII, so each doc is prefixed with a fixed
    // decomposed sample (e + U+0301, A/i + U+0308) that NFC must compose —
    // char counts shrink by exactly 3 and the md5 pins the composed bytes
    // against DuckDB's nfc_normalize. Pure per-row scan work (one codegen
    // call, no shuffle); at 100 TB this rides the ingest scan for free.
    Declared("q108_unicode_nfc",
      (s, dir) => {
        // decomposed on purpose (combining acute/diaeresis as separate
        // codepoints), written as escapes so a source-encoding pass can't
        // silently recompose them
        val raw = concat(lit("Cafe\u0301 A\u0308pfel nai\u0308ve "), col("text"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), raw.as("raw"))
          .select(col("doc_id"),
            big(length(col("raw"))).as("raw_chars"),
            big(length(nfc(col("raw")))).as("nfc_chars"),
            md5(nfc(col("raw"))).as("nfc_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(raw) AS BIGINT) AS raw_chars,
             |  CAST(len(nfc_normalize(raw)) AS BIGINT) AS nfc_chars,
             |  md5(nfc_normalize(raw)) AS nfc_md5
             |FROM (SELECT doc_id,
             |        'Cafe' || chr(769) || ' A' || chr(776) || 'pfel nai' || chr(776) || 've ' || text AS raw
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // q161 — DETERMINISTIC FIXED-SIZE STRATIFIED SAMPLE: exactly
    // min(5, |stratum|) documents per (source, lang) stratum, chosen by
    // md5(source|lang|doc_id) order — a seedless, engine-independent,
    // re-runnable sample (same corpus → same sample, on any engine), the
    // eval-set / human-review draw q64's RATE-based domain mixing cannot
    // give (rates keep ~p·n docs, this keeps exactly n).
    //
    // Shape at 100 TB: one shuffle on the stratum key; the per-stratum
    // window sorts only within strata. For heavy strata the window's full
    // sort upgrades to Udafs.BoundedTopK (q148) — ≤5 rows per partition per
    // stratum cross the exchange instead of the stratum's full sort run.
    Declared("q161_strat_sample",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"), col("lang"))
          .orderBy(col("h"), col("doc_id"))
        Tables.load(s, dir, "documents")
          .select(col("source"), col("lang"), col("doc_id"),
            md5(concat_ws("|", col("source"), col("lang"), col("doc_id"))).as("h"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 5)
          .select(col("source"), col("lang"), big(col("rk")).as("rk"),
            col("doc_id"), col("h"))
          .orderBy(col("source"), col("lang"), col("rk"))
      },
      Some("""SELECT source, lang, CAST(rk AS BIGINT) AS rk, doc_id, h
             |FROM (SELECT source, lang, doc_id, h,
             |        ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY h, doc_id) AS rk
             |      FROM (SELECT source, lang, doc_id,
             |              md5(source || '|' || lang || '|' || doc_id) AS h
             |            FROM documents))
             |WHERE rk <= 5 ORDER BY source, lang, rk""".stripMargin))
  )
}
