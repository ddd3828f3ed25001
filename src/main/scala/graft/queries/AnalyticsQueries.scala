package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.ColumnOps.{idiv, ppm}
import graft.model.Tables
import Protocol._

/** Time-series market-analytics operators ([EXT], SURVEY §2.2): the
  * tick-stream statistics the reference's BTCUSDT table exists to serve
  * (`start_all_pipeline.py:509-510` runs ad-hoc SQL over the loaded trades)
  * — time-weighted averages, realized variance, and multi-granularity
  * rollup cascades — generalized to the `events` fixture stream.
  *
  * All arithmetic follows the integer-micro discipline (q72/q134): values
  * lift to exact BIGINT micro-units at the leaf, wide products run in
  * DECIMAL(38,0) (a value-µ × day-µs product reaches ~5e19 > 2⁶³), every
  * division is a floor division on non-negative operands (Spark `div` ≡
  * DuckDB `//` there), so sums are order-insensitive and the oracle is
  * bit-exact.
  */
object AnalyticsQueries extends QueryModule {

  private val D38 = DecimalType(38, 0)

  /** events → (event_type, day index, µs instant, exact value in µ-units). */
  private def tape(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events")
      .select(
        col("event_type"),
        idiv(unix_micros(col("ts")), lit(86400000000L)).as("d"),
        unix_micros(col("ts")).as("us"),
        (dec(col("value")) * lit(1000000)).cast("long").as("v_micro"),
        col("event_id"))

  private val tapeSql =
    """SELECT event_type, epoch_us(ts) // 86400000000 AS d, epoch_us(ts) AS us,
      |  CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_micro, event_id
      |FROM events""".stripMargin

  override val declared: Seq[Declared] = Seq(

    // q154 — TWAP (time-weighted average value) per (event_type, day): each
    // observation holds until the next one, so its weight is the µs gap to
    // the successor; the day's final observation carries no segment and is
    // dropped (both engines, same rule). TWAP_µ = Σ(v_µ·gap) div Σ gap —
    // the product runs in DECIMAL(38,0) (5.6e8 µ × 8.64e10 µs ≈ 4.8e19).
    //
    // Shape at 100 TB: ONE shuffle on (event_type, d) serves both the lead()
    // window and the aggregate — the window's required partitioning is
    // reused by the groupBy (no second exchange), and day-partitioned input
    // would turn the shuffle into a partition-local sort.
    Declared("q154_twap",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"), col("d"))
          .orderBy(col("us"), col("event_id"))
        tape(s, dir)
          .withColumn("nxt", lead(col("us"), 1).over(w))
          .where(col("nxt").isNotNull)
          .withColumn("wgt", col("nxt") - col("us"))
          .groupBy(col("event_type"), col("d"))
          .agg(
            big(count(lit(1))).as("n_segs"),
            idiv(sum(col("v_micro").cast(D38) * col("wgt")),
              sum(col("wgt").cast(D38))).cast("long").as("twap_micro"))
          .orderBy(col("event_type"), col("d"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |seg AS (
              |  SELECT event_type, d, v_micro,
              |    LEAD(us) OVER (PARTITION BY event_type, d ORDER BY us, event_id) - us AS wgt
              |  FROM e)
              |SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS n_segs,
              |  CAST(SUM(CAST(v_micro AS HUGEINT) * wgt) // SUM(CAST(wgt AS HUGEINT)) AS BIGINT) AS twap_micro
              |FROM seg WHERE wgt IS NOT NULL
              |GROUP BY event_type, d ORDER BY event_type, d""".stripMargin)),

    // q155 — realized variance per (event_type, day): mean squared move of
    // consecutive observations, RV_µ² = Σ Δ² div n_moves. Δ ≤ 5.6e8 µ so
    // Δ² ≤ 3.2e17; thousands of moves per day overflow BIGINT → the square
    // runs in DECIMAL(38,0). Same single-shuffle window→agg reuse as q154.
    Declared("q155_realized_var",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"), col("d"))
          .orderBy(col("us"), col("event_id"))
        tape(s, dir)
          .withColumn("prev", lag(col("v_micro"), 1).over(w))
          .where(col("prev").isNotNull)
          .withColumn("dlt", (col("v_micro") - col("prev")).cast(D38))
          .groupBy(col("event_type"), col("d"))
          .agg(
            big(count(lit(1))).as("n_moves"),
            idiv(sum(col("dlt") * col("dlt")), count(lit(1)).cast(D38))
              .cast("long").as("rv_micro2"))
          .orderBy(col("event_type"), col("d"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |mv AS (
              |  SELECT event_type, d,
              |    CAST(v_micro - LAG(v_micro) OVER (PARTITION BY event_type, d ORDER BY us, event_id) AS HUGEINT) AS dlt
              |  FROM e)
              |SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS n_moves,
              |  CAST(SUM(dlt * dlt) // CAST(COUNT(*) AS HUGEINT) AS BIGINT) AS rv_micro2
              |FROM mv WHERE dlt IS NOT NULL
              |GROUP BY event_type, d ORDER BY event_type, d""".stripMargin)),

    // q156 — ROLLUP CASCADE: hourly stats re-aggregated from minute-level
    // PARTIALS, never the raw rows twice. Every statistic is chosen to be
    // reaggregatable (sum-of-sums, count-of-counts, min-of-mins,
    // max-of-maxes); the hourly average divides the re-summed numerator by
    // the re-summed count — never an average of averages. The oracle
    // computes the hour directly from raw events, so the gate PROVES the
    // cascade is lossless.
    //
    // Shape at 100 TB: this is the materialized-rollup pattern — the minute
    // table is ~10⁴× smaller than the tape, lives as a parquet rollup (q92
    // maintains exactly such a view incrementally), and every coarser
    // granularity derives from it with a counter-sized shuffle.
    Declared("q156_rollup_cascade",
      (s, dir) => {
        val minute = tape(s, dir)
          .groupBy(col("event_type"), idiv(col("us"), lit(60000000L)).as("m"))
          .agg(sum(col("v_micro")).as("s"), count(lit(1)).as("c"),
            min(col("v_micro")).as("mn"), max(col("v_micro")).as("mx"))
        minute
          .groupBy(col("event_type"), idiv(col("m"), lit(60L)).as("h"))
          .agg(
            big(sum(col("c"))).as("n_events"),
            idiv(sum(col("s")), sum(col("c"))).as("avg_micro"),
            min(col("mn")).as("min_micro"),
            max(col("mx")).as("max_micro"),
            big(count(lit(1))).as("n_minutes"))
          .orderBy(col("event_type"), col("h"))
      },
      Some(s"""WITH e AS ($tapeSql)
              |SELECT event_type, us // 3600000000 AS h,
              |  CAST(COUNT(*) AS BIGINT) AS n_events,
              |  SUM(v_micro) // COUNT(*) AS avg_micro,
              |  MIN(v_micro) AS min_micro, MAX(v_micro) AS max_micro,
              |  CAST(COUNT(DISTINCT us // 60000000) AS BIGINT) AS n_minutes
              |FROM e GROUP BY event_type, us // 3600000000
              |ORDER BY event_type, h""".stripMargin)),

    // q157 — ONE-PASS COLUMN PROFILER: rows/nulls/distincts/min/max for four
    // lineitem measures (one made deliberately nullable via NULLIF(tax,0) so
    // the null path is exercised — the fixtures carry no physical NULLs) in
    // a SINGLE scan. The multi-column COUNT(DISTINCT …) lowers to ONE
    // Expand(×4)+two-level aggregate — one shuffle for all four columns —
    // and the 1-row result unpivots to the profile table via stack().
    //
    // Shape at 100 TB: this is the schema-audit primitive (data-quality
    // dashboards, ingest gates). Expand multiplies the scan ×4 in-flight but
    // partial aggregation collapses each partition to ≤ndv rows before the
    // exchange; for wider tables, batches of ~8 columns per pass bound the
    // expand factor.
    Declared("q157_profile",
      (s, dir) => {
        val micro = (c: org.apache.spark.sql.Column) =>
          (dec(c) * lit(1000000)).cast("long")
        val li = Tables.load(s, dir, "lineitem").select(
          micro(col("l_quantity")).as("qty"),
          micro(col("l_extendedprice")).as("price"),
          micro(col("l_discount")).as("disc"),
          nullif(micro(col("l_tax")), lit(0L)).as("tax_nz"))
        val one = li.agg(
          count(lit(1)).as("n_rows"),
          count(col("qty")).as("nn_qty"), countDistinct(col("qty")).as("nd_qty"),
          min(col("qty")).as("mn_qty"), max(col("qty")).as("mx_qty"),
          count(col("price")).as("nn_price"), countDistinct(col("price")).as("nd_price"),
          min(col("price")).as("mn_price"), max(col("price")).as("mx_price"),
          count(col("disc")).as("nn_disc"), countDistinct(col("disc")).as("nd_disc"),
          min(col("disc")).as("mn_disc"), max(col("disc")).as("mx_disc"),
          count(col("tax_nz")).as("nn_tax"), countDistinct(col("tax_nz")).as("nd_tax"),
          min(col("tax_nz")).as("mn_tax"), max(col("tax_nz")).as("mx_tax"))
        one.selectExpr(
          """stack(4,
            |  'l_discount',      n_rows - nn_disc,  nd_disc,  mn_disc,  mx_disc,
            |  'l_extendedprice', n_rows - nn_price, nd_price, mn_price, mx_price,
            |  'l_quantity',      n_rows - nn_qty,   nd_qty,   mn_qty,   mx_qty,
            |  'l_tax_nonzero',   n_rows - nn_tax,   nd_tax,   mn_tax,   mx_tax)
            |  AS (col_name, n_null, n_distinct, min_micro, max_micro)""".stripMargin,
          "n_rows")
          .select(col("col_name"), big(col("n_rows")).as("n_rows"),
            big(col("n_null")).as("n_null"), big(col("n_distinct")).as("n_distinct"),
            col("min_micro"), col("max_micro"))
          .orderBy(col("col_name"))
      },
      Some("""WITH li AS (
             |  SELECT CAST(CAST(l_quantity AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS qty,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS price,
             |    CAST(CAST(l_discount AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS disc,
             |    NULLIF(CAST(CAST(l_tax AS DECIMAL(18,6)) * 1000000 AS BIGINT), 0) AS tax_nz
             |  FROM lineitem)
             |SELECT 'l_discount' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(COUNT(*) - COUNT(disc) AS BIGINT) AS n_null,
             |  CAST(COUNT(DISTINCT disc) AS BIGINT) AS n_distinct,
             |  MIN(disc) AS min_micro, MAX(disc) AS max_micro FROM li
             |UNION ALL
             |SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
             |  CAST(COUNT(*) - COUNT(price) AS BIGINT),
             |  CAST(COUNT(DISTINCT price) AS BIGINT), MIN(price), MAX(price) FROM li
             |UNION ALL
             |SELECT 'l_quantity', CAST(COUNT(*) AS BIGINT),
             |  CAST(COUNT(*) - COUNT(qty) AS BIGINT),
             |  CAST(COUNT(DISTINCT qty) AS BIGINT), MIN(qty), MAX(qty) FROM li
             |UNION ALL
             |SELECT 'l_tax_nonzero', CAST(COUNT(*) AS BIGINT),
             |  CAST(COUNT(*) - COUNT(tax_nz) AS BIGINT),
             |  CAST(COUNT(DISTINCT tax_nz) AS BIGINT), MIN(tax_nz), MAX(tax_nz) FROM li
             |ORDER BY col_name""".stripMargin)),

    // q159 — EXACT 2σ ANOMALY DAYS: flag (event_type, day) whose daily value
    // sum deviates from that type's mean by more than two population
    // standard deviations — with ZERO floats: |x-µ| > 2σ cross-multiplies to
    // (n·x - S)² > 4·(n·SS - S²) over integer micro-units (the q79 moments
    // trick turned into a filter). Products reach ~10²⁹, so they run in
    // DECIMAL(38,0) (HUGEINT on the oracle side) — exact, order-free,
    // engine-identical.
    //
    // Shape at 100 TB: daily is a counter-sized rollup; the moments come
    // from a PARTITIONED window over it (≤ |event_type| partitions of
    // ≤ |days| rows — never a global window), and the filter is in-row.
    Declared("q159_anomaly_days",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
        val daily = tape(s, dir)
          .groupBy(col("event_type"), col("d"))
          .agg(sum(col("v_micro")).as("x"))
        val st = daily
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sm", sum(col("x")).over(w))
          .withColumn("ss", sum(col("x").cast(D38) * col("x")).over(w))
        val lhs = col("n").cast(D38) * col("x") - col("sm")
        val rhs = lit(4).cast(D38) *
          (col("n").cast(D38) * col("ss") - col("sm").cast(D38) * col("sm"))
        st.where(lhs * lhs > rhs)
          .select(col("event_type"), col("d"), col("x").as("day_micro"),
            big(col("n")).as("n_days"))
          .orderBy(col("event_type"), col("d"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |daily AS (SELECT event_type, d, SUM(v_micro) AS x FROM e GROUP BY event_type, d),
              |st AS (
              |  SELECT event_type, d, x, COUNT(*) OVER w AS n, SUM(x) OVER w AS s,
              |    SUM(CAST(x AS HUGEINT) * x) OVER w AS ss
              |  FROM daily WINDOW w AS (PARTITION BY event_type))
              |SELECT event_type, d, x AS day_micro, CAST(n AS BIGINT) AS n_days
              |FROM st
              |WHERE (CAST(n AS HUGEINT) * x - s) * (CAST(n AS HUGEINT) * x - s)
              |      > 4 * (CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
              |ORDER BY event_type, d""".stripMargin)),

    // q163 — EXACT LEAST-SQUARES TREND per event_type: the OLS slope of
    // daily value sums over the day index, from the closed form
    // slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — every moment an exact
    // BIGINT (x ≤ days, y in micro-units; n·Σxy tops out ~10¹⁷). Both
    // engines truncate the final division TOWARD ZERO explicitly (sign
    // split), because Spark's `div` truncates while DuckDB's `//` floors —
    // they differ on negative slopes, which real trends produce.
    //
    // Shape at 100 TB: daily is a counter-sized rollup; the moments are one
    // tiny re-aggregation — regression over a 100 TB tape costs one scan.
    Declared("q163_trend_slope",
      (s, dir) => {
        val daily = tape(s, dir)
          .groupBy(col("event_type"), col("d"))
          .agg(sum(col("v_micro")).as("y"))
          .withColumn("x", col("d") - min(col("d")).over(
            Window.partitionBy(col("event_type"))))
        val m = daily.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
        val num = col("n") * col("sxy") - col("sx") * col("sy")
        val den = col("n") * col("sxx") - col("sx") * col("sx")
        m.where(col("n") >= 2)
          .select(col("event_type"), big(col("n")).as("n_days"),
            idiv(col("sy"), col("n")).as("mean_micro"),
            (signum(num).cast("long") * idiv(abs(num), den)).as("slope_micro_per_day"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |daily AS (SELECT event_type, d, SUM(v_micro) AS y FROM e GROUP BY event_type, d),
              |dx AS (SELECT event_type, d - MIN(d) OVER (PARTITION BY event_type) AS x, y FROM daily),
              |m AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
              |        SUM(x * x) AS sxx, SUM(x * y) AS sxy
              |      FROM dx GROUP BY event_type)
              |SELECT event_type, CAST(n AS BIGINT) AS n_days, sy // n AS mean_micro,
              |  CASE WHEN n * sxy - sx * sy < 0
              |       THEN -((-(n * sxy - sx * sy)) // (n * sxx - sx * sx))
              |       ELSE (n * sxy - sx * sy) // (n * sxx - sx * sx) END
              |    AS slope_micro_per_day
              |FROM m WHERE n >= 2 ORDER BY event_type""".stripMargin)),

    // q166 — EXACT GINI SKEW DIAGNOSTIC for a join key: how unevenly orders
    // distribute over customers, as the exact Gini coefficient of the
    // per-key count distribution — THE pre-flight skew probe before sizing
    // a shuffle join (Gini→1 ⇒ salt or skew-split; q55 is the cure, this is
    // the diagnosis). Sorted-form identity, all integers:
    //   gini_ppm = 10⁶·(2·Σ i·x₍ᵢ₎ − (n+1)·S) div (n·S),  x₍ᵢ₎ asc, S = Σx.
    // Tie order among equal counts cannot change Σ i·x₍ᵢ₎ (swap-invariant),
    // so any total tie-break gives the same value on both engines. The
    // global rank comes from operators.GlobalRank (range-partitioned
    // offsets — no single-partition window anywhere); alongside: the top
    // key's share and the share of the top 1 % of keys, both exact ppm.
    Declared("q166_skew_gini",
      (s, dir) => {
        val perKey = Tables.load(s, dir, "orders")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("x"))
        val ranked = graft.operators.GlobalRank.withRankColumns(
          perKey, Seq(col("x"), col("o_custkey")))
        val m = ranked.agg(
          count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(col("rank") * col("x")).as("rx"), max(col("x")).as("mx"))
        // top-1%-of-keys share: keys with rank > n - ceil(n/100)
        val top = ranked.crossJoin(broadcast(m.select(col("n"))))
          .where(col("rank") > col("n") - idiv(col("n") + lit(99L), lit(100L)))
          .agg(sum(col("x")).as("top1_sum"))
        m.crossJoin(broadcast(top))
          .select(
            big(col("n")).as("n_keys"), big(col("s")).as("n_rows"),
            ppm(lit(2L) * col("rx") - (col("n") + 1L) * col("s"),
              col("n") * col("s")).as("gini_ppm"),
            ppm(col("mx"), col("s")).as("max_share_ppm"),
            ppm(col("top1_sum"), col("s")).as("top1pct_share_ppm"))
      },
      Some("""WITH pk AS (SELECT o_custkey, COUNT(*) AS x FROM orders GROUP BY o_custkey),
             |r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS rank FROM pk),
             |m AS (SELECT COUNT(*) AS n, SUM(x) AS s, SUM(rank * x) AS rx, MAX(x) AS mx FROM r),
             |t AS (SELECT SUM(x) AS top1_sum FROM r, m WHERE rank > n - (n + 99) // 100)
             |SELECT CAST(n AS BIGINT) AS n_keys, CAST(s AS BIGINT) AS n_rows,
             |  CAST(1000000 * (2 * rx - (n + 1) * s) // (n * s) AS BIGINT) AS gini_ppm,
             |  CAST(1000000 * mx // s AS BIGINT) AS max_share_ppm,
             |  CAST(1000000 * top1_sum // s AS BIGINT) AS top1pct_share_ppm
             |FROM m, t""".stripMargin)),

    // q167 — EXACT JOIN-CARDINALITY PREDICTION: |A ⋈ₖ B| = Σₖ aₖ·bₖ from
    // per-key counts alone — the shuffle-sizing pre-flight that tells you a
    // join's output volume (and its hottest key's share) for the cost of
    // two counter-sized aggregates, WITHOUT running the join. Here on the
    // (user_id, day) self-join of events (co-activity pairs): the query
    // outputs the prediction AND the executed join's actual count in one
    // row — the gate proves predicted == actual. At 100 TB you run only
    // the left half; a hot_share_ppm near 10⁶ says salt before joining.
    Declared("q167_join_cardinality",
      (s, dir) => {
        val keyed = Tables.load(s, dir, "events")
          .select(col("user_id"),
            idiv(unix_micros(col("ts")), lit(86400000000L)).as("d"))
        val c = keyed.groupBy(col("user_id"), col("d")).agg(count(lit(1)).as("c"))
        val pred = c.agg(
          big(count(lit(1))).as("n_groups"),
          sum(col("c") * col("c")).as("predicted_rows"),
          max(col("c") * col("c")).as("hot_pairs"))
        val actual = keyed.as("a")
          .join(keyed.as("b"),
            col("a.user_id") === col("b.user_id") && col("a.d") === col("b.d"))
          .agg(count(lit(1)).as("actual_rows"))
        pred.crossJoin(broadcast(actual))
          .select(col("n_groups"), col("predicted_rows"), col("actual_rows"),
            col("hot_pairs"),
            ppm(col("hot_pairs"), col("predicted_rows"))
              .as("hot_share_ppm"))
      },
      Some("""WITH k AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
              |c AS (SELECT user_id, d, COUNT(*) AS c FROM k GROUP BY user_id, d),
              |p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
              |        CAST(SUM(c*c) AS BIGINT) AS predicted_rows,
              |        CAST(MAX(c*c) AS BIGINT) AS hot_pairs FROM c),
              |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
              |      FROM k x JOIN k y ON x.user_id = y.user_id AND x.d = y.d)
              |SELECT n_groups, predicted_rows, actual_rows, hot_pairs,
              |  1000000 * hot_pairs // predicted_rows AS hot_share_ppm
              |FROM p, a""".stripMargin)),

    // q169 — EXACT EXPONENTIAL MOVING AVERAGE (α=1/2, window-16
    // truncation): the recursive EMA is not parallelizable as stated
    // (EMAₜ = α·xₜ + (1-α)·EMAₜ₋₁ is a sequential dependency), but
    // truncating the geometric tail at 16 terms makes it a FIXED-WEIGHT
    // windowed sum — associative, order-free, exact:
    //   ema_µ = Σⱼ₌₀..₁₅ v₍ₜ₋ⱼ₎·2¹⁵⁻ʲ div 65535    (Σ2ʲ = 2¹⁶−1)
    // The dropped tail is < 2⁻¹⁶ of the signal — below the µ-unit
    // resolution. Only full windows emit (a null lag nulls the chain).
    //
    // Shape at 100 TB: one partitioned window per series — the sequential
    // recurrence becomes 16 in-row multiply-adds after ONE sort, instead of
    // a driver-side sequential scan. THE pattern for making "recursive"
    // smoothers distribute.
    Declared("q169_ema",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("us"), col("event_id"))
        val num = (0 to 15)
          .map(j => lag(col("v_micro"), j).over(w) * lit(1L << (15 - j)))
          .reduce(_ + _)
        tape(s, dir)
          .withColumn("num", num)
          .where(col("num").isNotNull)
          .select(col("event_type"), col("us"),
            idiv(col("num"), lit(65535L)).as("ema_micro"))
          .orderBy(col("event_type"), col("us"))
      },
      Some {
        val terms = (0 to 15)
          .map(j => s"LAG(v_micro, $j) OVER w * ${1L << (15 - j)}")
          .mkString(" + ")
        s"""WITH e AS ($tapeSql),
           |x AS (SELECT event_type, us, $terms AS num
           |      FROM e WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id))
           |SELECT event_type, us, num // 65535 AS ema_micro
           |FROM x WHERE num IS NOT NULL
           |ORDER BY event_type, us""".stripMargin
      }),

    // q173 — SEASONAL DECOMPOSITION (weekly-naive): split each type's daily
    // series into a 7-day cycle component (mean of its cycle slot, exact
    // floor-µ) and a residual, then surface each type's top-3 anomalous
    // days BY RESIDUAL — "unusual for a Saturday" rather than q159's
    // "unusual overall". Cycle slot = d % 7 (epoch-day cycle — calendar-
    // convention-free, identical on both engines). Residuals can be
    // negative: ranking uses abs(), but the OUTPUT is the signed residual.
    //
    // Shape at 100 TB: daily rollup (counter-sized) → slot means via ONE
    // partitioned window over it → per-type top-3 via a second partitioned
    // window. Nothing touches raw rows twice.
    Declared("q173_seasonality",
      (s, dir) => {
        val daily = tape(s, dir)
          .groupBy(col("event_type"), col("d"))
          .agg(sum(col("v_micro")).as("y"))
          .withColumn("slot", col("d") % 7)
        val wSlot = Window.partitionBy(col("event_type"), col("slot"))
        val wTop = Window.partitionBy(col("event_type"))
          .orderBy(abs(col("resid")).desc, col("d"))
        daily
          .withColumn("slot_mean", idiv(sum(col("y")).over(wSlot),
            count(lit(1)).over(wSlot)))
          .withColumn("resid", col("y") - col("slot_mean"))
          .withColumn("rk", row_number().over(wTop))
          .where(col("rk") <= 3)
          .select(col("event_type"), big(col("rk")).as("rk"), col("d"),
            col("slot"), col("y").as("day_micro"), col("slot_mean"),
            col("resid"))
          .orderBy(col("event_type"), col("rk"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |daily AS (SELECT event_type, d, d % 7 AS slot, SUM(v_micro) AS y
              |          FROM e GROUP BY event_type, d),
              |sm AS (SELECT event_type, d, slot, y,
              |         SUM(y) OVER w // COUNT(*) OVER w AS slot_mean
              |       FROM daily WINDOW w AS (PARTITION BY event_type, slot)),
              |r AS (SELECT event_type, d, slot, y, slot_mean, y - slot_mean AS resid,
              |        ROW_NUMBER() OVER (PARTITION BY event_type
              |          ORDER BY ABS(y - slot_mean) DESC, d) AS rk
              |      FROM sm)
              |SELECT event_type, CAST(rk AS BIGINT) AS rk, d, slot,
              |  y AS day_micro, slot_mean, resid
              |FROM r WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin))
  )
}
