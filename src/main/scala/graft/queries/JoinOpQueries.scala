package graft.queries

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.{AsOfJoin, RangeJoin}
import Protocol._

/** Time-series join operators over `events` (SURVEY §2.2 [EXT]): as-of join
  * and bounded range join — the tick-data lookups natural to the reference's
  * domain that neither MySQL 5.7 nor stock Spark provide as primitives.
  * Implementations live in graft.operators; these entries pin their
  * semantics against DuckDB's native ASOF JOIN / interval join.
  */
object JoinOpQueries extends QueryModule {

  override val declared: Seq[Declared] = Seq(

    // q36 — backward as-of join: for every click, the latest view of the
    // same user at or before the click. One shuffle, no row amplification
    // (operators.AsOfJoin union+window formulation).
    Declared("q36_asof_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        // right side must be unique per (user, ts): keep the max-event_id view
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("v_value"))
        AsOfJoin.backward(clicks, views, Seq("user_id"), "ts", Seq("v_value"), "view_")
          .select(col("event_id"), col("user_id"),
            tmicro(col("ts")).as("ts"),
            tmicro(col("view_ts")).as("view_ts"),
            out6(dec(col("view_v_value"))).as("view_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH v AS (SELECT user_id, ts, max_by(value, event_id) AS v_value
             |          FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |     c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
             |SELECT c.event_id, c.user_id,
             |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
             |  strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
             |  CAST(ROUND(CAST(v.v_value AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS view_value
             |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts
             |ORDER BY c.event_id""".stripMargin)),

    // q69 — FORWARD as-of join: for every click, the earliest view of the
    // same user at or after the click (the "next quote" lookup mirrored).
    // Same union+window machinery as q36 with the following frame; DuckDB's
    // native forward ASOF (v.ts >= c.ts, inclusive) is the oracle. The
    // `nearest` direction has no native DuckDB twin; its semantics are
    // pinned against a naive per-row reference in OperatorSpec.
    Declared("q69_asof_forward",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("v_value"))
        AsOfJoin.forward(clicks, views, Seq("user_id"), "ts", Seq("v_value"), "view_")
          .select(col("event_id"), col("user_id"),
            tmicro(col("ts")).as("ts"),
            tmicro(col("view_ts")).as("view_ts"),
            out6(dec(col("view_v_value"))).as("view_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH v AS (SELECT user_id, ts, max_by(value, event_id) AS v_value
             |          FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |     c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
             |SELECT c.event_id, c.user_id,
             |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
             |  strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
             |  CAST(ROUND(CAST(v.v_value AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS view_value
             |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts >= c.ts
             |ORDER BY c.event_id""".stripMargin)),

    // q37 — bounded range join: events of the same user in the 5 minutes up
    // to each error (self excluded), zero-preserving. Bucketed equi-join
    // (operators.RangeJoin), 2× left amplification instead of per-key O(n·m).
    Declared("q37_range_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val slim = ev.select(col("user_id"), col("ts"), col("event_id"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id"))
        val joined = RangeJoin.backwardWindow(errors, slim, Seq("user_id"), "ts", 300000000L)
          .filter(col("r.event_id") =!= col("l.event_id"))
          .groupBy(col("l.event_id").as("event_id"))
          .agg(count(lit(1)).as("n_in_window"))
        errors.select(col("event_id"))
          .join(joined, Seq("event_id"), "left")
          .select(col("event_id"), coalesce(col("n_in_window"), lit(0L)).as("n_in_window"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT e.event_id, CAST(COUNT(x.event_id) AS BIGINT) AS n_in_window
             |FROM events e LEFT JOIN events x
             |  ON e.user_id = x.user_id
             | AND x.ts >= e.ts - INTERVAL 5 MINUTE AND x.ts <= e.ts
             | AND x.event_id <> e.event_id
             |WHERE e.event_type = 'error'
             |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin)),

    // q74 — q36's backward as-of through the NATIVE Catalyst operator
    // (plans.AsOfJoinPlan → AsOfJoinExec via the injected planner strategy):
    // same query, same DuckDB ASOF JOIN oracle, different physical plan — a
    // co-partitioned co-sorted O(|L|+|R|) merge with no union glue or
    // window frame. Keeping both declared pins the two formulations to the
    // same hash forever.
    Declared("q74_asof_native",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("v_value"))
        AsOfJoin.backwardNative(clicks, views, Seq("user_id"), "ts", Seq("v_value"), "view_")
          .select(col("event_id"), col("user_id"),
            tmicro(col("ts")).as("ts"),
            tmicro(col("view_ts")).as("view_ts"),
            out6(dec(col("view_v_value"))).as("view_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH v AS (SELECT user_id, ts, max_by(value, event_id) AS v_value
             |          FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |     c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
             |SELECT c.event_id, c.user_id,
             |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
             |  strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
             |  CAST(ROUND(CAST(v.v_value AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS view_value
             |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts
             |ORDER BY c.event_id""".stripMargin)),

    // q77 — q69's FORWARD as-of through the native operator (AsOfForward
    // merge: right cursor stops at the first same-key row at-or-after the
    // probe — no held copy needed, left's ascending order makes consumed
    // rows dead). Same DuckDB forward-ASOF oracle as q69.
    Declared("q77_asof_forward_native",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("v_value"))
        AsOfJoin.forwardNative(clicks, views, Seq("user_id"), "ts", Seq("v_value"), "view_")
          .select(col("event_id"), col("user_id"),
            tmicro(col("ts")).as("ts"),
            tmicro(col("view_ts")).as("view_ts"),
            out6(dec(col("view_v_value"))).as("view_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH v AS (SELECT user_id, ts, max_by(value, event_id) AS v_value
             |          FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |     c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
             |SELECT c.event_id, c.user_id,
             |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
             |  strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
             |  CAST(ROUND(CAST(v.v_value AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS view_value
             |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts >= c.ts
             |ORDER BY c.event_id""".stripMargin)),

    // q84 — NEAREST as-of through the native operator (AsOfNearest merge:
    // backward-mode consume keeps a held match, and each probe decides
    // between that hold and the cursor row by |Δts|, ties to the past).
    // DuckDB has no nearest ASOF, so the oracle composes its backward and
    // forward ASOF joins and picks the closer side with the same
    // tie-to-backward rule — both payload columns are selected by ONE CASE
    // condition so the emitted (ts, value) always come from the same row.
    Declared("q84_asof_nearest_native",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("v_value"))
        AsOfJoin.nearestNative(clicks, views, Seq("user_id"), "ts", Seq("v_value"), "view_")
          .select(col("event_id"), col("user_id"),
            tmicro(col("ts")).as("ts"),
            tmicro(col("view_ts")).as("view_ts"),
            out6(dec(col("view_v_value"))).as("view_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH v AS (SELECT user_id, ts, max_by(value, event_id) AS v_value
             |          FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |     c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
             |     b AS (SELECT c.event_id, c.user_id, c.ts, v.ts AS m_ts, v.v_value AS m_value
             |           FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts),
             |     f AS (SELECT c.event_id, v.ts AS m_ts, v.v_value AS m_value
             |           FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts >= c.ts)
             |SELECT b.event_id, b.user_id,
             |  strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
             |  strftime(CASE WHEN f.m_ts IS NULL THEN b.m_ts
             |                WHEN b.m_ts IS NULL THEN f.m_ts
             |                WHEN b.ts - b.m_ts <= f.m_ts - b.ts THEN b.m_ts
             |                ELSE f.m_ts END, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
             |  CAST(ROUND(CAST(CASE WHEN f.m_ts IS NULL THEN b.m_value
             |                WHEN b.m_ts IS NULL THEN f.m_value
             |                WHEN b.ts - b.m_ts <= f.m_ts - b.ts THEN b.m_value
             |                ELSE f.m_value END AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS view_value
             |FROM b JOIN f USING (event_id)
             |ORDER BY b.event_id""".stripMargin)),

    // q103 — q74's backward as-of through the SKEW-PROOF SALTED recipe
    // (AsOfJoin.backwardNativeSalted: deterministic probe salt + reference
    // replication over (user_id, salt)) against the SAME DuckDB ASOF
    // oracle. Salting must be a pure physical rewrite — identical hash to
    // the unsalted plan, forever. SkewAsOfSpec pins the skew mechanics;
    // this pins the semantics under the gate.
    Declared("q103_asof_salted",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("v_value"))
        AsOfJoin.backwardNativeSalted(clicks, views, Seq("user_id"), "ts",
            Seq("v_value"), "view_", salts = 8)
          .select(col("event_id"), col("user_id"),
            tmicro(col("ts")).as("ts"),
            tmicro(col("view_ts")).as("view_ts"),
            out6(dec(col("view_v_value"))).as("view_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH v AS (SELECT user_id, ts, max_by(value, event_id) AS v_value
             |          FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |     c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
             |SELECT c.event_id, c.user_id,
             |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
             |  strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
             |  CAST(ROUND(CAST(v.v_value AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS view_value
             |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts
             |ORDER BY c.event_id""".stripMargin)),

    // q170 — INCREMENTAL JOIN-VIEW MAINTENANCE under the gate: orders ⋈
    // customer materialized by operators.IncrementalJoinView across THREE
    // delta batches that append to BOTH sides simultaneously (batch i
    // carries orders with o_orderkey%3==i and customers with
    // c_custkey%3==i), then the maintained view is aggregated and must
    // hash-match the oracle's one-shot join — proving the three-term delta
    // rule (ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB) produced every joined pair exactly
    // once and never recomputed the full join. The cross-mod pairs (an
    // order arriving before OR after its customer) are exactly the cases a
    // naive ΔA⋈B-only maintenance loses.
    Declared("q170_ivm_join",
      (s, dir) => {
        import graft.operators.IncrementalJoinView
        val base = SharedStages.scratchDir("q170")
        val st = IncrementalJoinView.State(s"$base/a", s"$base/b", s"$base/v")
        val orders = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey").as("custkey"),
            col("o_totalprice"))
        val cust = Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
        (0 to 2).foreach { i =>
          IncrementalJoinView.applyDelta(s, st,
            orders.where(col("o_orderkey") % 3 === i),
            cust.where(col("custkey") % 3 === i),
            Seq("custkey"))
        }
        val proto = orders.join(cust, Seq("custkey")).limit(0)
        IncrementalJoinView.view(s, st, proto)
          .groupBy(col("c_mktsegment"))
          .agg(big(count(lit(1))).as("n_orders"),
            out6(sum(dec(col("o_totalprice")))).as("total"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
             |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // q246 — SPATIAL GRID JOIN: all customer-point pairs within Chebyshev
    // distance 8 on a 499×491 integer grid (md5-derived coordinates — the
    // house portable-hash idiom, so the scatter is genuinely uniform at
    // every SF and both engines derive identical points; a key-linear
    // lattice was measured to produce ZERO near pairs at small SF). Engine
    // side: GridJoin's 3×3 cell-neighborhood probe against a cell index —
    // candidates linear in points × 9 × local density, directional
    // emission, no dedup shuffle. Oracle side: DuckDB's brute-force
    // inequality join (IEJoin), affordable at gate scale and structurally
    // DIFFERENT from the engine's bucketing — a genuine cross-check, not
    // the same algorithm twice.
    Declared("q246_grid_spatial_join",
      (s, dir) => {
        import graft.functions.ColumnOps.hexLong
        val h = md5(concat(lit("pt"), col("c_custkey").cast("string")))
        val pts = Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("id"),
            (hexLong(h, 1, 15) % 499).as("x"),
            (hexLong(h, 17, 15) % 491).as("y"))
        graft.operators.GridJoin.chebyshevSelfJoin(pts, "id", "x", "y", 8L)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH p AS (SELECT c_custkey AS id,
             |    CAST(('0x' || substr(md5('pt' || c_custkey), 1, 15)) AS BIGINT) % 499 AS x,
             |    CAST(('0x' || substr(md5('pt' || c_custkey), 17, 15)) AS BIGINT) % 491 AS y
             |  FROM customer)
             |SELECT a.id AS id_a, b.id AS id_b,
             |  CAST(b.x - a.x AS BIGINT) AS dx, CAST(b.y - a.y AS BIGINT) AS dy
             |FROM p a JOIN p b
             |  ON a.id < b.id
             | AND b.x BETWEEN a.x - 8 AND a.x + 8
             | AND b.y BETWEEN a.y - 8 AND a.y + 8
             |ORDER BY id_a, id_b""".stripMargin)),

    // q247 — GRID KNN: each point's 3 nearest neighbors within the radius,
    // by (Chebyshev distance, neighbor id) — the nearest-facility /
    // reverse-geocode read on top of q246's candidate machinery. The
    // directional pair set symmetrizes (a map-side union, no new join),
    // then one point-partitioned window ranks candidates — k·n rows out.
    // Points with no neighbor in range simply have no rows, matching the
    // radius-bounded KNN contract (a global fallback scan would be the
    // unbounded-KNN operator, a different beast).
    Declared("q247_grid_knn",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.ColumnOps.hexLong
        val h = md5(concat(lit("pt"), col("c_custkey").cast("string")))
        val pts = Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("id"),
            (hexLong(h, 1, 15) % 499).as("x"),
            (hexLong(h, 17, 15) % 491).as("y"))
        val pairs = graft.operators.GridJoin
          .chebyshevSelfJoin(pts, "id", "x", "y", 8L)
          .select(col("id_a"), col("id_b"),
            greatest(abs(col("dx")), abs(col("dy"))).as("dist"))
        val sym = pairs.unionByName(pairs.select(
          col("id_b").as("id_a"), col("id_a").as("id_b"), col("dist")))
        val w = Window.partitionBy(col("id_a")).orderBy(col("dist"), col("id_b"))
        sym.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("id_a").as("id"), big(col("rank")).as("rank"),
            col("id_b").as("nn_id"), col("dist"))
          .orderBy(col("id"), col("rank"))
      },
      Some("""WITH p AS (SELECT c_custkey AS id,
             |    CAST(('0x' || substr(md5('pt' || c_custkey), 1, 15)) AS BIGINT) % 499 AS x,
             |    CAST(('0x' || substr(md5('pt' || c_custkey), 17, 15)) AS BIGINT) % 491 AS y
             |  FROM customer),
             |pr AS (SELECT a.id AS id, b.id AS nn_id,
             |    GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)) AS dist
             |  FROM p a JOIN p b ON a.id <> b.id
             |   AND b.x BETWEEN a.x - 8 AND a.x + 8
             |   AND b.y BETWEEN a.y - 8 AND a.y + 8),
             |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, nn_id) AS rank
             |       FROM pr)
             |SELECT id, CAST(rank AS BIGINT) AS rank, nn_id, CAST(dist AS BIGINT) AS dist
             |FROM rk WHERE rank <= 3 ORDER BY id, rank""".stripMargin)),

    // q249 — SPATIO-TEMPORAL CO-PRESENCE: user pairs within Chebyshev 16
    // during the SAME hour — the contact-tracing / co-occurrence join,
    // which is the grid-join pattern with time folded into the bucketing
    // key: probe explodes its 3×3 cell neighborhood, the equi-join runs on
    // (hour, cx, cy), so pairs never form across hours and candidate work
    // is per-slice local density, not corpus². Positions are the md5 scatter
    // per (user, hour); output aggregates to pair level (n co-present
    // hours, first hour) — the entity-pair summary a downstream graph
    // (q164/q205/q211 family) would ingest.
    Declared("q249_copresence",
      (s, dir) => {
        import graft.functions.ColumnOps.{floorDiv, hexLong, idiv}
        val d = 16L
        val h = md5(concat(lit("u"), col("user_id").cast("string"),
          lit("h"), col("hour").cast("string")))
        val pos = Tables.load(s, dir, "events")
          .select(col("user_id"),
            idiv(unix_micros(col("ts")), lit(3600000000L)).as("hour"))
          .distinct()
          .select(col("user_id"), col("hour"),
            (hexLong(h, 1, 15) % 499).as("x"), (hexLong(h, 17, 15) % 491).as("y"))
        val build = pos
          .withColumn("cx", floorDiv(col("x"), d))
          .withColumn("cy", floorDiv(col("y"), d))
        val probe = build
          .select(col("user_id").as("ua"), col("hour"), col("x").as("xa"),
            col("y").as("ya"),
            explode(sequence(col("cx") - 1, col("cx") + 1)).as("cx"), col("cy").as("cy0"))
          .select(col("ua"), col("hour"), col("xa"), col("ya"), col("cx"),
            explode(sequence(col("cy0") - 1, col("cy0") + 1)).as("cy"))
        probe.join(build.select(col("user_id").as("ub"), col("hour"),
            col("x").as("xb"), col("y").as("yb"), col("cx"), col("cy")),
            Seq("hour", "cx", "cy"))
          .filter(col("ua") < col("ub") &&
            abs(col("xa") - col("xb")) <= d && abs(col("ya") - col("yb")) <= d)
          .groupBy(col("ua"), col("ub"))
          .agg(big(count(lit(1))).as("n_hours"), min(col("hour")).as("first_hour"))
          .orderBy(col("ua"), col("ub"))
      },
      Some("""WITH uh AS (SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hour FROM events),
             |p AS (SELECT user_id, hour,
             |    CAST(('0x' || substr(md5('u' || user_id || 'h' || hour), 1, 15)) AS BIGINT) % 499 AS x,
             |    CAST(('0x' || substr(md5('u' || user_id || 'h' || hour), 17, 15)) AS BIGINT) % 491 AS y
             |  FROM uh)
             |SELECT a.user_id AS ua, b.user_id AS ub,
             |  CAST(COUNT(*) AS BIGINT) AS n_hours, CAST(MIN(a.hour) AS BIGINT) AS first_hour
             |FROM p a JOIN p b ON a.hour = b.hour AND a.user_id < b.user_id
             | AND b.x BETWEEN a.x - 16 AND a.x + 16
             | AND b.y BETWEEN a.y - 16 AND a.y + 16
             |GROUP BY 1, 2 ORDER BY ua, ub""".stripMargin))
  )
}
