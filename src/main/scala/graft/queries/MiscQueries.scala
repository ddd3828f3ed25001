package graft.queries

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.{AnnIvf, AnnLsh}
import Protocol._

/** Remaining SURVEY §2.2 matrix rows: JSON parsing (events.props),
  * approximate distinct (HLL), and the LSH-bucketed ANN scale path.
  */
object MiscQueries extends QueryModule {

  /** Brute-force exact top-3-per-query oracle (same shape as q27): valid for
    * q40/q46 because their fixture configs provably/verifiably cover the true
    * top-k (see the per-query notes below).
    */
  private val BruteForceTop3Sql: String =
    """SELECT qid, rn, vec_id, cos FROM (
      |  SELECT q.vec_id AS qid, e.vec_id,
      |    CAST(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS DECIMAL(18,6)) AS cos,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id) AS rn
      |  FROM embeddings e, embeddings q
      |  WHERE q.vec_id < 20 AND e.vec_id <> q.vec_id
      |) WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  override val declared: Seq[Declared] = Seq(

    // q38 — JSON parse of events.props ({"k": int}) into a MapType (the
    // §2.2 "map ops" row: from_json → map, element_at lookup): per
    // event_type stats over the extracted value. A struct-schema parse
    // (StructType.fromDDL("k BIGINT") + getField) is the fixed-schema
    // alternative; the map path also covers schemaless keys.
    Declared("q38_json_props",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .withColumn("k", try_element_at(
            from_json(col("props"), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.LongType)),
            lit("k")))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            big(sum(when(col("k") > 50, 1).otherwise(0))).as("n_high"),
            out6(sum(dec(col("k"))) / count(lit(1))).as("avg_k"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
             |  CAST(ROUND(SUM(CAST(k AS DECIMAL(18,6))) / COUNT(*), 6) AS DECIMAL(18,6)) AS avg_k
             |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // q39 — HLL approximate distinct next to the exact counts. The sketch
    // value is implementation-specific, so the oracle-checked columns are the
    // exact counts plus "estimate within ±10% of exact" booleans: Spark
    // computes the bound genuinely (rsd=0.02 ⇒ ±10% is a ≥5σ envelope), the
    // oracle pins it TRUE. Tight numeric bounds on the estimates themselves
    // are pinned in ScalaTest (QueriesSpec).
    Declared("q39_approx_distinct",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .agg(
            big(countDistinct(col("l_partkey"))).as("exact_parts"),
            big(countDistinct(col("l_suppkey"))).as("exact_supps"),
            approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
            approx_count_distinct(col("l_suppkey"), 0.02).as("as"))
          .select(
            col("exact_parts"), col("exact_supps"),
            (abs(col("ap") - col("exact_parts"))
              <= col("exact_parts") * 0.1).as("approx_parts_ok"),
            (abs(col("as") - col("exact_supps"))
              <= col("exact_supps") * 0.1).as("approx_supps_ok"))
      },
      Some("""SELECT
             |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
             |  TRUE AS approx_parts_ok, TRUE AS approx_supps_ok
             |FROM lineitem""".stripMargin)),

    // q40 — LSH-bucketed ANN (operators.AnnLsh). The full machinery runs
    // (hyperplane signatures, band explode, bucket equi-join, exact re-rank)
    // but the band parameters are pinned so the candidate buckets provably
    // contain the true top-k on the fixture — empirically verified recall 1.0
    // at sf0.001/0.01 — making brute-force exact top-k the oracle. The
    // genuinely-approximate configs keep their recall-≥0.8 bound in AnnSpec.
    Declared("q40_ann_lsh",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("e").as("qe"))
        AnnLsh.topK(e, q, k = 3, nPlanes = 16, nBands = 16)
          .select(col("qid"), col("rn"), col("vec_id"), out6(col("cos")).as("cos"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(BruteForceTop3Sql)),

    // q46 — IVF ANN (operators.AnnIvf): deterministic k-means buckets,
    // nprobe search THROUGH THE PERSISTED INDEX — the inverted lists are
    // written once as a bucketed table and the search is a broadcast
    // equi-join onto them (no re-assignment, no corpus-side shuffle;
    // ScaleOpsSpec pins the plan). With nprobe = k (all 8 inverted lists
    // probed) the search is exhaustive BY CONSTRUCTION — every candidate is
    // in exactly one list and every list is probed — so brute-force exact
    // top-k is a valid oracle regardless of how training placed the
    // centroids, while the full train/build/probe machinery still executes.
    // The genuinely-approximate nprobe<k config keeps its recall bound in
    // AnnMultimodalSpec.
    Declared("q46_ann_ivf",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("e").as("qe"))
        val centroids = AnnIvf.trainCentroids(e, k = 8, iters = 2, dim = 64)
        AnnIvf.buildIndex(e, centroids, table = "ivf_idx")
        AnnIvf.topKIndexed(s, "ivf_idx", q, k = 3, centroids, nprobe = 8)
          .select(col("qid"), col("rn"), col("vec_id"), out6(col("cos")).as("cos"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(BruteForceTop3Sql)),

    // q41 — first/last-in-group via min_by/max_by (the OHLC open/close
    // idiom, SURVEY §2.2 "first/last in group"): daily bars per event_type.
    // events.ts is globally unique in the fixtures, so the ordering key is
    // unambiguous in both engines.
    Declared("q41_minmax_by",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy(tdate(date_trunc("day", col("ts"))).as("day"), col("event_type"))
          .agg(
            out6(dec(min_by(col("value"), col("ts")))).as("open"),
            out6(dec(max(col("value")))).as("high"),
            out6(dec(min(col("value")))).as("low"),
            out6(dec(max_by(col("value"), col("ts")))).as("close"),
            count(lit(1)).as("n"))
          .orderBy(col("day"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
             |  CAST(ROUND(CAST(arg_min(value, ts) AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS open,
             |  CAST(ROUND(CAST(max(value) AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS high,
             |  CAST(ROUND(CAST(min(value) AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS low,
             |  CAST(ROUND(CAST(arg_max(value, ts) AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS close,
             |  COUNT(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // q79 — correlation / covariance / stddev via EXACT second moments:
    // the builtin corr/covar/stddev aggregates are one-pass DOUBLE
    // algorithms whose result depends on partition merge order — fine for
    // analytics, unpinnable for a bit-exact cross-engine gate. Instead the
    // five moments (Σx, Σy, Σx², Σy², Σxy) aggregate in EXACT decimal
    // (order-insensitive, map-side combinable — the same trick as q73's
    // centroids), and the closed-form statistics are evaluated in doubles
    // from those exact sums with an identical expression on both sides:
    // same inputs, same IEEE ops, same bits. Shape at 100 TB: one scan, one
    // 6-accumulator hash agg — cheaper than builtin corr (which keeps the
    // same moments, just in doubles).
    Declared("q79_exact_moments",
      (s, dir) => {
        val x = dec(col("l_quantity"))
        val y = dec(col("l_extendedprice"))
        val d = (c: org.apache.spark.sql.Column) => c.cast("double")
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
          .select(col("l_returnflag"),
            big(col("n")).as("n"),
            out6((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
              sqrt((d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
                   (d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))))).as("corr_qp"),
            out6((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
              (d(col("n")) * d(col("n")))).as("covar_pop_qp"),
            out6(sqrt((d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) /
              (d(col("n")) * d(col("n"))))).as("std_qty"),
            out6(sqrt((d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))) /
              (d(col("n")) * d(col("n"))))).as("std_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH s AS (SELECT l_returnflag, COUNT(*) AS n,
             |    SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
             |    -- DECIMAL(19,6) operands force DuckDB's int128 multiply path
             |    -- (the int64 fast path overflows on price^2 raws); scale-6
             |    -- rounding is identical so the sums stay bit-equal to Spark's
             |    SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
             |    SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS syy,
             |    SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             |  CAST(ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
             |    sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
             |         (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS DECIMAL(18,6)) AS corr_qp,
             |  CAST(ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
             |    (CAST(n AS DOUBLE)*CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS covar_pop_qp,
             |  CAST(ROUND(sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) /
             |    (CAST(n AS DOUBLE)*CAST(n AS DOUBLE))), 6) AS DECIMAL(18,6)) AS std_qty,
             |  CAST(ROUND(sqrt((CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) /
             |    (CAST(n AS DOUBLE)*CAST(n AS DOUBLE))), 6) AS DECIMAL(18,6)) AS std_price
             |FROM s ORDER BY l_returnflag""".stripMargin)),

    // q88 — typed UDAF under the gate: the volume-weighted average price
    // (the reference domain's VWAP) through `functions.udaf(Aggregator)`.
    // The buffer is EXACT BigDecimal parts (Σw·x, Σw) — order-insensitive,
    // map-side combinable, so the custom aggregate meets the same
    // determinism bar as the builtins it sits beside (the double-buffered
    // WeightedMean twin stays spec-only for exactly this reason). The one
    // inexact step — the division — happens outside the UDAF where every
    // other gated query puts it.
    Declared("q88_udaf_vwap",
      (s, dir) => {
        import org.apache.spark.sql.Encoders
        val parts = udaf(graft.functions.Udafs.DecimalWeightedSum,
          Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL))
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(parts(dec(col("l_extendedprice")), dec(col("l_quantity"))).as("w"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"), big(col("n")).as("n"),
            // Σw·x ≈ 2.7e10 at sf0.01 — past the 2^53·1e-6 terminal-DOUBLE
            // exactness bound (Protocol.ExactDoubleBound caught it), so the
            // raw weighted sum ships as EXACT INTEGER MICROS in a BIGINT
            // terminal: decimal×1e6 → round(…,0) → long, no double anywhere
            big(round(col("w.sum_wx") * lit(1000000L), 0)).as("sum_wx_micro"),
            out6(col("w.sum_w")).as("sum_qty"),
            out6(col("w.sum_wx") / col("w.sum_w")).as("vwap"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  -- DECIMAL(19,6) multiply operands force DuckDB's int128 path (q79 note)
             |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) * 1000000, 0) AS BIGINT) AS sum_wx_micro,
             |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS sum_qty,
             |  CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE)
             |       / CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS DECIMAL(18,6)) AS vwap
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // q148 — BOUNDED TOP-K AS AN AGGREGATE: per return flag, the 3 most
    // expensive line items via `Udafs.BoundedTopK` — the aggregation
    // alternative to q16's window-rank shape. The buffer never exceeds k
    // rows and combines map-side, so the shuffle carries ≤ k rows per
    // partition per group instead of the whole group reaching a sort —
    // the scale-right form when groups are huge and k is small. Result is
    // bit-identical to the ROW_NUMBER oracle on any partitioning (total
    // order: price DESC, orderkey ASC, linenumber ASC).
    Declared("q148_topk_agg",
      (s, dir) => {
        import org.apache.spark.sql.Encoders
        val top3 = udaf(new graft.functions.Udafs.BoundedTopK(3),
          Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong, Encoders.scalaLong))
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(top3(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")).as("t"))
          .select(col("l_returnflag"),
            posexplode(arrays_zip(col("t.score"), col("t.k1"), col("t.k2"))))
          .select(col("l_returnflag"), (col("pos") + 1).cast("long").as("rk"),
            col("col.score").as("price"), col("col.k1").as("l_orderkey"),
            big(col("col.k2")).as("l_linenumber"))
          .orderBy(col("l_returnflag"), col("rk"))
      },
      Some("""SELECT l_returnflag, CAST(rk AS BIGINT) AS rk, price, l_orderkey,
             |  CAST(l_linenumber AS BIGINT) AS l_linenumber
             |FROM (SELECT l_returnflag, l_extendedprice AS price, l_orderkey, l_linenumber,
             |        ROW_NUMBER() OVER (PARTITION BY l_returnflag
             |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
             |      FROM lineitem)
             |WHERE rk <= 3 ORDER BY l_returnflag, rk""".stripMargin)),

    // q160 — VARIANT semi-structured type (Spark 4): parse_json lifts
    // events.props into the open-schema binary VARIANT encoding and
    // variant_get path-extracts with a target type — the schema-on-read
    // answer for payloads whose shape drifts (vs q38's closed MapType cast,
    // which silently nulls any non-conforming document). try_variant_get
    // covers the missing-path arm so evolution is explicit, not a crash.
    //
    // Shape at 100 TB: VARIANT's binary encoding skips per-row JSON
    // re-parsing in every downstream expression (parse once at ingest,
    // path-extract many times), and columnar shredding of hot paths is the
    // engine-side upgrade this query's plan is already shaped for.
    Declared("q160_variant_props",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .select(col("event_type"), parse_json(col("props")).as("v"))
          .select(col("event_type"),
            expr("variant_get(v, '$.k', 'long')").as("k"),
            expr("try_variant_get(v, '$.missing', 'long')").as("miss"))
          .groupBy(col("event_type"))
          .agg(
            big(count(lit(1))).as("n"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"),
            big(countDistinct(col("k"))).as("nd_k"),
            big(count(col("miss"))).as("n_missing_path"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             |  SUM(k) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
             |  CAST(COUNT(DISTINCT k) AS BIGINT) AS nd_k,
             |  CAST(COUNT(m) AS BIGINT) AS n_missing_path
             |FROM (SELECT event_type,
             |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |        CAST(json_extract_string(props, '$.missing') AS BIGINT) AS m
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // q171 — TABLE DIFF / RECONCILIATION: symmetric difference between a
    // table and its next "publication" (deterministically derived here:
    // every 101st event deleted, every 97th value bumped, every 103rd
    // re-inserted shifted), classified per event_type into deleted /
    // inserted / modified. Diff = EXCEPT ALL in both directions over the
    // compared projection; ids present on both diff sides are
    // modifications, id-only-in-A deletions, id-only-in-B insertions — the
    // audit every warehouse publish pipeline runs before a swap
    // (VersionedView's audit hook is where this plugs in).
    //
    // Shape at 100 TB: EXCEPT ALL lowers to one hash aggregation over the
    // union (count-matching), partitioned by the compared row — one
    // shuffle, no all-pairs anything; the classification join runs on the
    // (small) diff, not the tables.
    Declared("q171_table_diff",
      (s, dir) => {
        val a = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            (dec(col("value")) * lit(1000000)).cast("long").as("v"))
        val b = a.where(col("event_id") % 101 =!= 0)
          .select(col("event_id"), col("event_type"),
            when(col("event_id") % 97 === 0, col("v") + lit(1000000L))
              .otherwise(col("v")).as("v"))
          .unionByName(a.where(col("event_id") % 103 === 0)
            .select((col("event_id") + lit(1000000000L)).as("event_id"),
              col("event_type"), col("v")))
        val rem = a.exceptAll(b)   // rows gone or changed
        val add = b.exceptAll(a)   // rows new or changed
        val remK = rem.select(col("event_id"), col("event_type"))
        val addK = add.select(col("event_id"), col("event_type"))
        val modified = remK.join(addK, Seq("event_id", "event_type"), "left_semi")
          .select(col("event_type"), lit("modified").as("kind"))
        val deleted = remK.join(addK, Seq("event_id", "event_type"), "left_anti")
          .select(col("event_type"), lit("deleted").as("kind"))
        val inserted = addK.join(remK, Seq("event_id", "event_type"), "left_anti")
          .select(col("event_type"), lit("inserted").as("kind"))
        modified.unionByName(deleted).unionByName(inserted)
          .groupBy(col("event_type"), col("kind"))
          .agg(big(count(lit(1))).as("n"))
          .orderBy(col("event_type"), col("kind"))
      },
      Some("""WITH a AS (SELECT event_id, event_type,
             |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v FROM events),
             |b AS (
             |  SELECT event_id, event_type,
             |    CASE WHEN event_id % 97 = 0 THEN v + 1000000 ELSE v END AS v
             |  FROM a WHERE event_id % 101 <> 0
             |  UNION ALL
             |  SELECT event_id + 1000000000, event_type, v FROM a WHERE event_id % 103 = 0),
             |rem AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b),
             |add_ AS (SELECT * FROM b EXCEPT ALL SELECT * FROM a),
             |cls AS (
             |  SELECT event_type, CASE WHEN event_id IN (SELECT event_id FROM add_)
             |    THEN 'modified' ELSE 'deleted' END AS kind FROM rem
             |  UNION ALL
             |  SELECT event_type, 'inserted' FROM add_
             |  WHERE event_id NOT IN (SELECT event_id FROM rem))
             |SELECT event_type, kind, CAST(COUNT(*) AS BIGINT) AS n
             |FROM cls GROUP BY event_type, kind ORDER BY event_type, kind""".stripMargin)),

    // q237 — SQL:2003 MERGE INTO (batch upsert) through the MergeInto
    // operator: a per-customer order rollup snapshot (orders before the
    // cutoff) merged with the post-cutoff increment batch. Matched
    // customers UPDATE (totals added, status 'updated'), source-only
    // customers INSERT ('inserted'), target-only rows carry unchanged
    // ('base') — the three MERGE branches all exercised and attributed.
    // One full-outer equi-join; the oracle is the textbook FULL JOIN
    // rewrite. Scale notes on operators/MergeInto.scala.
    Declared("q237_merge_upsert",
      (s, dir) => {
        import graft.operators.MergeInto
        val ords = Tables.load(s, dir, "orders")
        def roll(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("o_custkey").as("custkey"))
            .agg(count(lit(1)).as("n"),
              out6(sum(dec(col("o_totalprice")))).as("tot"))
        val cutoff = lit("1998-01-01").cast("timestamp")
        val target = roll(ords.filter(col("o_orderdate") < cutoff))
          .withColumn("status", lit("base"))
        val source = roll(ords.filter(col("o_orderdate") >= cutoff))
        MergeInto.merge(target, source, Seq("custkey"),
          setOnMatch = Map(
            "n" -> (col("t_n") + col("s_n")),
            "tot" -> out6(col("t_tot") + col("s_tot")),
            "status" -> lit("updated")),
          insertOnUnmatched = Map(
            "n" -> col("s_n"),
            "tot" -> col("s_tot"),
            "status" -> lit("inserted")))
          .orderBy(col("custkey"))
      },
      Some("""WITH t AS (SELECT o_custkey AS custkey, COUNT(*) AS n,
             |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS tot
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
             |s AS (SELECT o_custkey AS custkey, COUNT(*) AS n,
             |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS tot
             |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1)
             |SELECT COALESCE(t.custkey, s.custkey) AS custkey,
             |  CAST(CASE WHEN t.custkey IS NOT NULL AND s.custkey IS NOT NULL THEN t.n + s.n
             |       WHEN t.custkey IS NULL THEN s.n ELSE t.n END AS BIGINT) AS n,
             |  CAST(ROUND(CASE WHEN t.custkey IS NOT NULL AND s.custkey IS NOT NULL THEN t.tot + s.tot
             |       WHEN t.custkey IS NULL THEN s.tot ELSE t.tot END, 6) AS DECIMAL(18,6)) AS tot,
             |  CASE WHEN t.custkey IS NOT NULL AND s.custkey IS NOT NULL THEN 'updated'
             |       WHEN t.custkey IS NULL THEN 'inserted' ELSE 'base' END AS status
             |FROM t FULL OUTER JOIN s ON t.custkey = s.custkey
             |ORDER BY custkey""".stripMargin))
  )
}
