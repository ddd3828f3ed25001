package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.ColumnOps.{idiv, ppm}
import graft.model.Tables
import graft.operators.{GlobalCumSum, GlobalRank}
import Protocol._

/** Distribution-statistics operators ([EXT], SURVEY §2.2): the exact
  * drawdown / autocorrelation / goodness-of-fit / classification /
  * changepoint diagnostics an analyst runs over the reference's loaded
  * trade table (`start_all_pipeline.py:509-510` ad-hoc SQL), generalized
  * to the fixture tables under the integer-micro determinism protocol
  * (Protocol scaladoc): exact BIGINT/DECIMAL(38,0) arithmetic, ppm
  * outputs, floor division on non-negative operands with the signum/abs
  * pattern where a quantity can be negative.
  */
object StatQueries extends QueryModule {

  private val D38 = DecimalType(38, 0)
  /** One day in µs. */
  private val Day = 86400000000L

  /** events → (event_type, day index, µs instant, exact µ-unit value). */
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

    // q175 — MAX DRAWDOWN per event_type: running peak of the µ-value tape
    // (RANGE-default frame over the unique (us, event_id) order), drawdown
    // = peak − value, report the deepest one with its peak/trough and the
    // instant it bottomed (earliest on ties: row_number over dd DESC,
    // us ASC). All integers — peak/dd are exact µ-units.
    //
    // Shape at 100 TB: ONE Exchange hashpartitioning(event_type) feeds
    // both window sorts (time order for the prefix-max, dd order for the
    // argmax) and the final pick — per-type partitions sort locally; a
    // symbol-partitioned tape would make both sorts partition-local. No
    // partition-less window anywhere.
    Declared("q175_max_drawdown",
      (s, dir) => {
        val wt = Window.partitionBy(col("event_type"))
          .orderBy(col("us"), col("event_id"))
        val dd = tape(s, dir)
          .withColumn("peak", max(col("v_micro")).over(wt))
          .withColumn("dd", col("peak") - col("v_micro"))
        val pick = Window.partitionBy(col("event_type"))
          .orderBy(col("dd").desc, col("us"), col("event_id"))
        dd.withColumn("rn", row_number().over(pick))
          .where(col("rn") === 1)
          .select(col("event_type"), col("dd").as("max_dd_micro"),
            col("peak").as("peak_micro"), col("v_micro").as("trough_micro"),
            col("us").as("trough_us"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |dd AS (
              |  SELECT event_type, us, v_micro,
              |    MAX(v_micro) OVER (PARTITION BY event_type ORDER BY us, event_id) AS peak,
              |    MAX(v_micro) OVER (PARTITION BY event_type ORDER BY us, event_id) - v_micro AS dd,
              |    event_id
              |  FROM e),
              |pick AS (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dd DESC, us, event_id) AS rn
              |  FROM dd)
              |SELECT event_type, dd AS max_dd_micro, peak AS peak_micro,
              |  v_micro AS trough_micro, us AS trough_us
              |FROM pick WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // q176 — LAG-1 AUTOCORRELATION of the daily total series per
    // event_type, exact to the stated definition: daily sums are floored
    // to WHOLE units (y = Σv_µ div 10⁶) so every sufficient statistic
    // (Σx, Σy, Σx², Σy², Σxy over consecutive-day pairs) stays in BIGINT
    // at sf0.1 and DECIMAL(38,0) covers the squared-covariance products
    // (num² ≈ 5e26 ≪ 1e38). Output is the SIGNED squared correlation in
    // ppm: sign(cov)·10⁶·num² div (denx·deny) — sqrt-free, hence exact
    // and engine-identical. At petabyte scale rescale y to a coarser unit
    // (same div, bigger constant) to keep num² inside DECIMAL(38,0).
    //
    // Shape at 100 TB: daily rollup is ONE counter-sized aggregate; the
    // lag window and final stats reuse the event_type partitioning —
    // one big shuffle total (the daily groupBy), then counters.
    Declared("q176_autocorr",
      (s, dir) => {
        val daily = tape(s, dir)
          .groupBy(col("event_type"), col("d"))
          .agg(idiv(sum(col("v_micro")), lit(1000000L)).as("y"))
        val wl = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val pairs = daily
          .withColumn("x", lag(col("y"), 1).over(wl))
          .where(col("x").isNotNull)
        val m = pairs.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast(D38)
        val denx = (col("n") * col("sxx") - col("sx") * col("sx")).cast(D38)
        val deny = (col("n") * col("syy") - col("sy") * col("sy")).cast(D38)
        m.where(col("n") >= 2 &&
            (col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("n") * col("syy") - col("sy") * col("sy")) > 0)
          .select(col("event_type"), big(col("n")).as("n_pairs"),
            (signum(num).cast("long") *
              idiv(lit(1000000L).cast(D38) * num * num, denx * deny).cast("long"))
              .as("acf1_r2_ppm"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |daily AS (SELECT event_type, d, SUM(v_micro) // 1000000 AS y
              |          FROM e GROUP BY event_type, d),
              |pr AS (SELECT event_type, y,
              |         LAG(y) OVER (PARTITION BY event_type ORDER BY d) AS x
              |       FROM daily),
              |m AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
              |        SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
              |      FROM pr WHERE x IS NOT NULL GROUP BY event_type)
              |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
              |  CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1
              |            WHEN n * sxy - sx * sy > 0 THEN 1 ELSE 0 END
              |    * ((1000000 * CAST(n * sxy - sx * sy AS HUGEINT) * (n * sxy - sx * sy))
              |       // (CAST(n * sxx - sx * sx AS HUGEINT) * (n * syy - sy * sy)))
              |    AS BIGINT) AS acf1_r2_ppm
              |FROM m
              |WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
              |ORDER BY event_type""".stripMargin)),

    // q177 — BENFORD FIRST-DIGIT law over order totals: the classic
    // fabricated-data / corrupted-feed screen. Leading digit comes from
    // the BIGINT cent rendering (identical string form on both engines —
    // no float formatting in the path); expectations are the exact
    // round(log10(1+1/d)·10⁶) constants, which sum to exactly 10⁶.
    // Deviation is |observed − expected| ppm, all integer.
    //
    // Shape at 100 TB: one 9-group hash aggregate + a 1-row broadcast
    // total — counters only after the scan.
    Declared("q177_benford",
      (s, dir) => {
        val exp = typedLit(Map(
          1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
          6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L))
        val digits = Tables.load(s, dir, "orders")
          .select(((dec(col("o_totalprice")) * 100).cast("long")).as("cent"))
          .select(substring(col("cent").cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        val total = digits.agg(sum(col("n")).as("total"))
        digits.crossJoin(broadcast(total))
          .select(col("digit"), big(col("n")).as("n"),
            ppm(col("n"), col("total")).as("obs_ppm"),
            exp(col("digit")).as("exp_ppm"))
          .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
          .orderBy(col("digit"))
      },
      Some("""WITH c AS (
             |  SELECT CAST(SUBSTR(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
             |  FROM orders),
             |d AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY digit),
             |t AS (SELECT SUM(n) AS total FROM d)
             |SELECT digit, n, 1000000 * n // total AS obs_ppm,
             |  CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
             |             WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
             |             WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END AS exp_ppm,
             |  ABS(1000000 * n // total -
             |  CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
             |             WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
             |             WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END) AS dev_ppm
             |FROM d, t ORDER BY digit""".stripMargin)),

    // q178 — EXACT two-sample KOLMOGOROV-SMIRNOV distance between the
    // order-total distributions of urgent vs non-urgent orders. At every
    // pooled distinct cent value the ECDF gap is the cross-multiplied
    // integer |c1·n2 − c2·n1| (no fractions anywhere); the statistic is
    // the max, reported in ppm of n1·n2 with the earliest achieving value.
    // Cumulative counts come from GlobalCumSum over the distinct-value
    // table — NO partition-less window; the top-1 is TakeOrdered.
    //
    // Shape at 100 TB: per-value aggregate (distinct-cents-sized), two
    // range-partitioned prefix passes over that counter table, a 1-row
    // broadcast of group totals, TakeOrdered(1). The raw scan feeds one
    // hash aggregate; everything after is counters.
    Declared("q178_ks_test",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select((dec(col("o_totalprice")) * 100).cast("long").as("cent"),
            when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("g1"))
        val perV = o.groupBy(col("cent")).agg(
          sum(col("g1")).as("cnt1"), sum(lit(1L) - col("g1")).as("cnt2"))
        val tot = perV.agg(sum(col("cnt1")).as("n1"), sum(col("cnt2")).as("n2"))
        val c1 = GlobalCumSum.withCumSum(perV, Seq(col("cent")), col("cnt1"), "c1")
        val c12 = GlobalCumSum.withCumSum(c1, Seq(col("cent")), col("cnt2"), "c2")
        c12.crossJoin(broadcast(tot))
          .withColumn("dnum", abs(col("c1") * col("n2") - col("c2") * col("n1")))
          .orderBy(col("dnum").desc, col("cent"))
          .limit(1)
          .select(big(col("n1")).as("n1"), big(col("n2")).as("n2"),
            ppm(col("dnum"), col("n1") * col("n2")).as("ks_ppm"),
            col("cent").as("ks_at_cent"))
      },
      Some("""WITH o AS (
             |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS cent,
             |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
             |  FROM orders),
             |pv AS (SELECT cent, SUM(g1) AS cnt1, SUM(1 - g1) AS cnt2 FROM o GROUP BY cent),
             |cum AS (SELECT cent,
             |          SUM(cnt1) OVER (ORDER BY cent ROWS UNBOUNDED PRECEDING) AS c1,
             |          SUM(cnt2) OVER (ORDER BY cent ROWS UNBOUNDED PRECEDING) AS c2
             |        FROM pv),
             |t AS (SELECT SUM(cnt1) AS n1, SUM(cnt2) AS n2 FROM pv)
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |  1000000 * ABS(c1 * n2 - c2 * n1) // (n1 * n2) AS ks_ppm,
             |  cent AS ks_at_cent
             |FROM cum, t
             |ORDER BY ABS(c1 * n2 - c2 * n1) DESC, cent LIMIT 1""".stripMargin)),

    // q179 — ABC CLASSIFICATION of parts by net revenue (the inventory
    // 70/90 Pareto cut): per-part net revenue in exact cent units
    // (cent·(10⁶−disc_ppm) products in DECIMAL(38,0), floored back to
    // cents), globally ranked by (net DESC, partkey) through GlobalCumSum,
    // classed by INCLUSIVE cumulative share (A ≤ 70 %, B ≤ 90 %, C rest)
    // via cross-multiplied integers (cum·10 vs total·7 — no division
    // before the final ppm report).
    //
    // Shape at 100 TB: part-keyed aggregate (one shuffle over the fact),
    // then ONE range pass over the part-sized counter table + a 1-row
    // broadcast total + a 3-group rollup. No partition-less window.
    Declared("q179_abc_class",
      (s, dir) => {
        val perPart = Tables.load(s, dir, "lineitem")
          .select(col("l_partkey"),
            ((dec(col("l_extendedprice")) * 100).cast("long").cast(D38) *
              (lit(1000000L) - (dec(col("l_discount")) * 1000000).cast("long")))
              .as("net_u"))
          .groupBy(col("l_partkey"))
          .agg(idiv(sum(col("net_u")), lit(1000000L).cast(D38)).cast("long").as("net_cent"))
        val tot = perPart.agg(sum(col("net_cent")).as("total"))
        val cum = GlobalCumSum.withCumSum(perPart,
          Seq(col("net_cent").desc, col("l_partkey")), col("net_cent"), "cum")
        cum.crossJoin(broadcast(tot))
          .withColumn("cls",
            when(col("cum") * 10 <= col("total") * 7, "A")
              .when(col("cum") * 10 <= col("total") * 9, "B")
              .otherwise("C"))
          .groupBy(col("cls"))
          .agg(big(count(lit(1))).as("n_parts"), sum(col("net_cent")).as("cls_net_cent"),
            max(col("total")).as("total"))
          .select(col("cls"), col("n_parts"), col("cls_net_cent"),
            ppm(col("cls_net_cent"), col("total")).as("share_ppm"))
          .orderBy(col("cls"))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey,
             |    CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS HUGEINT) *
             |      (1000000 - CAST(CAST(l_discount AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS net_u
             |  FROM lineitem),
             |pp AS (SELECT l_partkey, CAST(SUM(net_u) // 1000000 AS BIGINT) AS net_cent
             |       FROM li GROUP BY l_partkey),
             |cum AS (SELECT l_partkey, net_cent,
             |          SUM(net_cent) OVER (ORDER BY net_cent DESC, l_partkey ROWS UNBOUNDED PRECEDING) AS cum
             |        FROM pp),
             |t AS (SELECT SUM(net_cent) AS total FROM pp),
             |cls AS (SELECT CASE WHEN cum * 10 <= total * 7 THEN 'A'
             |                    WHEN cum * 10 <= total * 9 THEN 'B' ELSE 'C' END AS cls,
             |          net_cent, total
             |        FROM cum, t)
             |SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts, SUM(net_cent) AS cls_net_cent,
             |  1000000 * SUM(net_cent) // MAX(total) AS share_ppm
             |FROM cls GROUP BY cls ORDER BY cls""".stripMargin)),

    // q180 — CUSUM CHANGEPOINT per event_type: the day where the running
    // deviation of daily totals from the series mean peaks. Fraction-free:
    // n·cusum_k = n·Σ_{i≤k}y_i − k·S is an exact BIGINT (n ≤ days,
    // cum ≤ series total), argmax by |dev| with earliest-day tie-break,
    // reported as signed µ-units via signum·(|dev| div n).
    //
    // Shape at 100 TB: daily rollup (one counter-sized shuffle), then
    // every window — running sum, row index, series totals, argmax pick —
    // shares the single hashpartitioning(event_type) exchange.
    Declared("q180_cusum_shift",
      (s, dir) => {
        val daily = tape(s, dir)
          .groupBy(col("event_type"), col("d"))
          .agg(sum(col("v_micro")).as("y"))
        val wo = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val wa = Window.partitionBy(col("event_type"))
        val dev = daily
          .withColumn("cum", sum(col("y")).over(wo))
          .withColumn("k", row_number().over(wo).cast("long"))
          .withColumn("s", sum(col("y")).over(wa))
          .withColumn("n", count(lit(1)).over(wa))
          .withColumn("dev", col("n") * col("cum") - col("k") * col("s"))
        val pick = Window.partitionBy(col("event_type"))
          .orderBy(abs(col("dev")).desc, col("d"))
        dev.withColumn("rn", row_number().over(pick))
          .where(col("rn") === 1)
          .select(col("event_type"), col("d").as("shift_d"), big(col("n")).as("n_days"),
            (signum(col("dev")).cast("long") * idiv(abs(col("dev")), col("n")))
              .as("cusum_micro"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |daily AS (SELECT event_type, d, SUM(v_micro) AS y FROM e GROUP BY event_type, d),
              |dev AS (
              |  SELECT event_type, d,
              |    COUNT(*) OVER (PARTITION BY event_type) *
              |      SUM(y) OVER (PARTITION BY event_type ORDER BY d ROWS UNBOUNDED PRECEDING)
              |    - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) *
              |      SUM(y) OVER (PARTITION BY event_type) AS dev,
              |    COUNT(*) OVER (PARTITION BY event_type) AS n
              |  FROM daily),
              |pick AS (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ABS(dev) DESC, d) AS rn
              |  FROM dev)
              |SELECT event_type, d AS shift_d, CAST(n AS BIGINT) AS n_days,
              |  CAST(CASE WHEN dev < 0 THEN -((-dev) // n) ELSE dev // n END AS BIGINT) AS cusum_micro
              |FROM pick WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // q181 — LAST-TOUCH ATTRIBUTION: each purchase event's value is
    // credited to the user's most recent PRIOR channel event (click /
    // view / signup) within a 7-day horizon, else 'none'. The channel
    // carry-forward is last(..., ignoreNulls) over the user-keyed time
    // order — two last() calls over the SAME window spec pick fields of
    // the same row by construction, so type and instant stay consistent.
    // Value is exact µ-units; output is per-channel purchase count +
    // attributed revenue.
    //
    // Shape at 100 TB: ONE Exchange hashpartitioning(user_id) feeds the
    // carry-forward window; the channel rollup is counter-sized. The
    // horizon check is row-local arithmetic — no as-of join needed when
    // the streams are the same table (contrast q36/q74, which join two
    // different tables).
    Declared("q181_last_touch",
      (s, dir) => {
        val isCh = col("event_type").isin("click", "view", "signup")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"),
            (dec(col("value")) * lit(1000000)).cast("long").as("v_micro"),
            col("event_id"))
        e.withColumn("ch", last(when(isCh, col("event_type")), ignoreNulls = true).over(w))
          .withColumn("ch_us", last(when(isCh, col("us")), ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .withColumn("channel",
            when(col("ch").isNotNull && col("us") - col("ch_us") <= lit(604800000000L),
              col("ch")).otherwise(lit("none")))
          .groupBy(col("channel"))
          .agg(big(count(lit(1))).as("n_purchases"),
            sum(col("v_micro")).as("attr_value_micro"))
          .orderBy(col("channel"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_type,
             |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_micro, event_id
             |  FROM events),
             |cf AS (
             |  SELECT *,
             |    LAST_VALUE(CASE WHEN event_type IN ('click','view','signup') THEN event_type END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS ch,
             |    LAST_VALUE(CASE WHEN event_type IN ('click','view','signup') THEN us END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS ch_us
             |  FROM e)
             |SELECT CASE WHEN ch IS NOT NULL AND us - ch_us <= 604800000000 THEN ch ELSE 'none' END AS channel,
             |  CAST(COUNT(*) AS BIGINT) AS n_purchases, SUM(v_micro) AS attr_value_micro
             |FROM cf WHERE event_type = 'purchase'
             |GROUP BY 1 ORDER BY channel""".stripMargin)),

    // q182 — MARKET-BASKET pair co-occurrence with exact lift: distinct
    // parts per order, ordered self-join (pa < pb) on the order key,
    // pair support counts, and lift_ppm = 10⁶·n_pair·N div (n_a·n_b) via
    // two counter-table joins. Top-20 by (support DESC, pa, pb).
    //
    // Shape at 100 TB: the self-join is EQUI on l_orderkey — both sides
    // shuffle-partition together, fan-out is Σ k_o·(k_o−1)/2 bounded by
    // basket size (~4), never cross-order. Pair counts and per-part
    // order counts are hash aggregates; the singles attach by two joins
    // on the part-keyed counter table (broadcast at test scale, equi at
    // warehouse scale — both correct); N is a 1-row broadcast.
    Declared("q182_basket_pairs",
      (s, dir) => {
        // r13: the distinct incidence and its ordered self-join are the
        // shared materialized stages (SharedStages.orderItems /
        // copurchasePairs) — n_pair IS the pair-support column supp, and
        // singles/total are scans of the landed incidence file. Before,
        // this query re-ran the join privately (guide §2.4).
        val items = SharedStages.orderItems(s, dir)
        val pairs = SharedStages.copurchasePairs(s, dir)
          .select(col("pa"), col("pb"), col("supp").as("n_pair"))
        val singles = items.groupBy(col("pk")).agg(count(lit(1)).as("n_one"))
        val total = items.select(col("ok")).distinct().agg(count(lit(1)).as("n_orders"))
        // Top-20 BEFORE the singles/lift attach: the ordering key
        // (n_pair DESC, pa, pb) is a total order over pair-table columns
        // alone, so the limit commutes with the joins — and the pair table
        // is the corpus-scaled side (the sf10 rehearsal measured 120 M
        // distinct pairs). Attaching singles first would ship it through
        // TWO more exchanges; attaching after ships 20 rows.
        val top = pairs.orderBy(col("n_pair").desc, col("pa"), col("pb")).limit(20)
        top
          .join(singles.withColumnRenamed("pk", "pa").withColumnRenamed("n_one", "n_a"), "pa")
          .join(singles.withColumnRenamed("pk", "pb").withColumnRenamed("n_one", "n_b"), "pb")
          .crossJoin(broadcast(total))
          .select(col("pa"), col("pb"), big(col("n_pair")).as("n_pair"),
            big(col("n_a")).as("n_a"), big(col("n_b")).as("n_b"),
            ppm(col("n_pair") * col("n_orders"),
              col("n_a") * col("n_b")).as("lift_ppm"))
          .orderBy(col("n_pair").desc, col("pa"), col("pb"))
      },
      Some("""WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |pr AS (
             |  SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS n_pair
             |  FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk
             |  GROUP BY a.pk, b.pk),
             |sg AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_one FROM it GROUP BY pk),
             |t AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM it)
             |SELECT pa, pb, n_pair, sa.n_one AS n_a, sb.n_one AS n_b,
             |  1000000 * n_pair * n_orders // (sa.n_one * sb.n_one) AS lift_ppm
             |FROM pr JOIN sg sa ON pr.pa = sa.pk JOIN sg sb ON pr.pb = sb.pk, t
             |ORDER BY n_pair DESC, pa, pb LIMIT 20""".stripMargin)),

    // q183 — DISTRIBUTION DRIFT as exact total-variation distance: the
    // value distribution of each event_type in the first half of the
    // timeline vs the second, over 10 fixed-width 50-unit bins.
    // Fraction-free: TVD_ppm = 10⁶·Σ_bin|c_a·n_b − c_b·n_a| div (2·n_a·n_b)
    // (the bin products run in DECIMAL(38,0) so petabyte counts can't
    // overflow). The midpoint day is a 1-row broadcast of (min,max).
    //
    // Shape at 100 TB: one (event_type, bin, half) counter aggregate
    // after the scan; everything downstream is ≤ types×bins rows. This
    // is the scheduled parity check between a historical training corpus
    // and this week's feed — the PSI-style gate without PSI's log.
    Declared("q183_tvd_drift",
      (s, dir) => {
        val t = tape(s, dir)
        val span = t.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        val binned = t.crossJoin(broadcast(span))
          .withColumn("half",
            when(col("d") < idiv(col("d0") + col("d1") + 1, lit(2L)), "a").otherwise("b"))
          .withColumn("bin", least(idiv(col("v_micro"), lit(50000000L)), lit(9L)))
          .groupBy(col("event_type"), col("bin"))
          .agg(sum(when(col("half") === "a", 1L).otherwise(0L)).as("c_a"),
            sum(when(col("half") === "b", 1L).otherwise(0L)).as("c_b"))
        val wt = Window.partitionBy(col("event_type"))
        binned
          .withColumn("n_a", sum(col("c_a")).over(wt))
          .withColumn("n_b", sum(col("c_b")).over(wt))
          .groupBy(col("event_type"))
          .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
            sum(abs(col("c_a").cast(D38) * col("n_b") - col("c_b").cast(D38) * col("n_a")))
              .as("tvd_num"))
          .select(col("event_type"), big(col("n_a")).as("n_a"), big(col("n_b")).as("n_b"),
            idiv(lit(1000000L).cast(D38) * col("tvd_num"),
              lit(2L).cast(D38) * col("n_a") * col("n_b")).cast("long").as("tvd_ppm"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |sp AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM e),
              |bn AS (
              |  SELECT event_type, LEAST(v_micro // 50000000, 9) AS bin,
              |    SUM(CASE WHEN d < (d0 + d1 + 1) // 2 THEN 1 ELSE 0 END) AS c_a,
              |    SUM(CASE WHEN d < (d0 + d1 + 1) // 2 THEN 0 ELSE 1 END) AS c_b
              |  FROM e, sp GROUP BY 1, 2),
              |wt AS (
              |  SELECT event_type, c_a, c_b,
              |    SUM(c_a) OVER (PARTITION BY event_type) AS n_a,
              |    SUM(c_b) OVER (PARTITION BY event_type) AS n_b
              |  FROM bn)
              |SELECT event_type, CAST(MAX(n_a) AS BIGINT) AS n_a, CAST(MAX(n_b) AS BIGINT) AS n_b,
              |  CAST((1000000 * SUM(ABS(CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a)))
              |    // (2 * CAST(MAX(n_a) AS HUGEINT) * MAX(n_b)) AS BIGINT) AS tvd_ppm
              |FROM wt GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // q184 — DISCRETE SURVIVAL CURVE over user activity spans: for every
    // day-offset k on a DENSE grid (0..max span), the number of users
    // still "alive" at k (span ≥ k, a reverse prefix sum via GlobalCumSum
    // over k DESC), the deaths at exactly k, and the exact hazard and
    // survival rates in ppm. The grid explodes from a 1-row (max_span)
    // broadcast so gap days appear with deaths=0 — the Kaplan-Meier
    // shape without its floating product.
    //
    // Shape at 100 TB: per-user span is ONE user-keyed aggregate; spans
    // histogram and the grid are ≤ span_max rows — counters all the way
    // after the first shuffle. No partition-less window (reverse cumsum
    // is the ranged prefix pass).
    Declared("q184_survival",
      (s, dir) => {
        val spans = Tables.load(s, dir, "events")
          .select(col("user_id"), idiv(unix_micros(col("ts")), lit(86400000000L)).as("d"))
          .groupBy(col("user_id"))
          .agg((max(col("d")) - min(col("d"))).as("span"))
        val deaths = spans.groupBy(col("span")).agg(count(lit(1)).as("deaths"))
        val grid = spans.agg(max(col("span")).as("ms"), count(lit(1)).as("n_users"))
          .select(explode(sequence(lit(0L), col("ms"))).as("k"), col("n_users"))
        val dense = grid.join(deaths, grid("k") === deaths("span"), "left")
          .select(col("k"), col("n_users"), coalesce(col("deaths"), lit(0L)).as("deaths"))
        GlobalCumSum.withCumSum(dense, Seq(col("k").desc), col("deaths"), "at_risk")
          .select(col("k"), big(col("at_risk")).as("at_risk"), big(col("deaths")).as("deaths"),
            ppm(col("deaths"), col("at_risk")).as("hazard_ppm"),
            ppm(col("at_risk"), col("n_users")).as("surv_ppm"))
          .orderBy(col("k"))
      },
      Some(s"""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
              |sp AS (SELECT user_id, MAX(d) - MIN(d) AS span FROM e GROUP BY user_id),
              |dth AS (SELECT span, CAST(COUNT(*) AS BIGINT) AS deaths FROM sp GROUP BY span),
              |m AS (SELECT MAX(span) AS ms, CAST(COUNT(*) AS BIGINT) AS n_users FROM sp),
              |grid AS (SELECT UNNEST(RANGE(0, ms + 1)) AS k, n_users FROM m),
              |dense AS (
              |  SELECT k, n_users, COALESCE(deaths, 0) AS deaths
              |  FROM grid LEFT JOIN dth ON grid.k = dth.span),
              |rc AS (
              |  SELECT *, SUM(deaths) OVER (ORDER BY k DESC ROWS UNBOUNDED PRECEDING) AS at_risk
              |  FROM dense)
              |SELECT k, CAST(at_risk AS BIGINT) AS at_risk, deaths,
              |  1000000 * deaths // at_risk AS hazard_ppm,
              |  1000000 * at_risk // n_users AS surv_ppm
              |FROM rc ORDER BY k""".stripMargin)),

    // q186 — DATA-QUALITY CONSTRAINT SUITE (Deequ-style declarative
    // checks): completeness, key uniqueness, domain membership, range,
    // positivity, and referential integrity — as ONE report row per
    // constraint with exact violation counts and a pass flag. All six
    // checks fold into THREE jobs: one fused conditional-aggregate pass
    // over orders (including the distinct-key count), one over lineitem,
    // and one anti-join count for referential integrity; the report is a
    // stack() melt of three 1-row broadcasts — never a scan per check.
    //
    // Shape at 100 TB: one fused wide scan per table plus a key-only
    // pruned scan pair for the anti-join — never a scan per check. The
    // reference's load pipeline assumes these invariants silently
    // (lambda_function.py trusts the CSV); this makes them a gated query.
    Declared("q186_dq_violations",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val l = Tables.load(s, dir, "lineitem")
        val oAgg = o.agg(
          count(lit(1)).as("o_n"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_null_cust"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dup_key"),
          sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L)).as("v_status"),
          sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("v_price"))
        val lAgg = l.agg(
          count(lit(1)).as("l_n"),
          sum(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1L).otherwise(0L))
            .as("v_disc"))
        val orphan = l.join(o.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("v_orphan"))
        oAgg.crossJoin(broadcast(lAgg)).crossJoin(broadcast(orphan))
          .selectExpr(
            """stack(6,
              |'orders.custkey_complete', o_n, v_null_cust,
              |'orders.orderkey_unique', o_n, v_dup_key,
              |'orders.status_domain',   o_n, v_status,
              |'orders.price_positive',  o_n, v_price,
              |'lineitem.discount_range', l_n, v_disc,
              |'lineitem.orderkey_refint', l_n, v_orphan
              |) AS (check_name, checked, violations)""".stripMargin)
          .select(col("check_name"), big(col("checked")).as("checked"),
            big(col("violations")).as("violations"),
            when(col("violations") === 0L, 1L).otherwise(0L).as("pass"))
          .orderBy(col("check_name"))
      },
      Some("""WITH oa AS (
             |  SELECT COUNT(*) AS o_n,
             |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_null_cust,
             |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_dup_key,
             |    SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS v_status,
             |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_price
             |  FROM orders),
             |la AS (
             |  SELECT COUNT(*) AS l_n,
             |    SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS v_disc
             |  FROM lineitem),
             |orph AS (
             |  SELECT COUNT(*) AS v_orphan FROM lineitem
             |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
             |rep AS (
             |  SELECT 'orders.custkey_complete' AS check_name, o_n AS checked, v_null_cust AS violations FROM oa
             |  UNION ALL SELECT 'orders.orderkey_unique', o_n, v_dup_key FROM oa
             |  UNION ALL SELECT 'orders.status_domain', o_n, v_status FROM oa
             |  UNION ALL SELECT 'orders.price_positive', o_n, v_price FROM oa
             |  UNION ALL SELECT 'lineitem.discount_range', l_n, v_disc FROM la
             |  UNION ALL SELECT 'lineitem.orderkey_refint', l_n, v_orphan FROM la, orph)
             |SELECT check_name, CAST(checked AS BIGINT) AS checked,
             |  CAST(violations AS BIGINT) AS violations,
             |  CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
             |FROM rep ORDER BY check_name""".stripMargin)),

    // q187 — BEHAVIORAL PATH MINING: the top-15 event-type TRIGRAMS over
    // each user's time-ordered stream (two lag windows on one user_id
    // exchange), with exact support share in ppm of all complete
    // trigrams. The sequence analogue of q135's document collocations.
    //
    // Shape at 100 TB: one Exchange hashpartitioning(user_id) for both
    // lags, one counter-sized trigram aggregate, a 1-row broadcast
    // total, TakeOrdered(15).
    Declared("q187_path_trigrams",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val tri = Tables.load(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"), col("event_id"))
          .withColumn("p1", lag(col("event_type"), 1).over(w))
          .withColumn("p2", lag(col("event_type"), 2).over(w))
          .where(col("p2").isNotNull)
          .select(concat_ws(">", col("p2"), col("p1"), col("event_type")).as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n"))
          // tri feeds the report AND the total: persist so the window pass
          // over the fact runs once (2 events scans otherwise — plan audit)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tot = tri.agg(sum(col("n")).as("total"))
        tri.crossJoin(broadcast(tot))
          .select(col("path"), big(col("n")).as("n"),
            ppm(col("n"), col("total")).as("share_ppm"))
          .orderBy(col("n").desc, col("path"))
          .limit(15)
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_type, event_id FROM events),
             |tg AS (
             |  SELECT user_id,
             |    LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY us, event_id) AS p2,
             |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS p1,
             |    event_type AS p0
             |  FROM e),
             |tri AS (
             |  SELECT p2 || '>' || p1 || '>' || p0 AS path, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM tg WHERE p2 IS NOT NULL GROUP BY 1),
             |t AS (SELECT SUM(n) AS total FROM tri)
             |SELECT path, n, 1000000 * n // total AS share_ppm
             |FROM tri, t ORDER BY n DESC, path LIMIT 15""".stripMargin)),

    // q188 — MAD ROBUST OUTLIER DAYS: days whose daily total deviates
    // from the per-type MEDIAN by more than 3× the median absolute
    // deviation — q159's 2σ screen made outlier-proof (one wild day
    // shifts a mean and inflates σ; the median/MAD pair shrugs). Exact
    // integer lower-medians via rank-at-⌈n/2⌉ over the type-partitioned
    // order; the 3·MAD cut is a plain integer comparison. MAD=0
    // degenerates to "any deviation" via strict >.
    //
    // Shape at 100 TB: daily rollup (the one fact shuffle), then four
    // windows + a self-equi-join of counter-sized tables, all on the
    // event_type partitioning.
    Declared("q188_mad_outliers",
      (s, dir) => {
        // daily feeds the median pass, the deviation join and (via devs)
        // the MAD pass; devs feeds the MAD pass and the output filter —
        // persist both so the fact aggregates once (4 events scans
        // otherwise — plan audit). Both are counter-sized (types×days).
        val daily = tape(s, dir)
          .groupBy(col("event_type"), col("d"))
          .agg(sum(col("v_micro")).as("y"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wa = Window.partitionBy(col("event_type"))
        def lowerMedian(df: org.apache.spark.sql.DataFrame, v: String, out: String) = {
          val wo = Window.partitionBy(col("event_type")).orderBy(col(v), col("d"))
          df.withColumn("rn", row_number().over(wo))
            .withColumn("n", count(lit(1)).over(wa))
            .where(col("rn") === idiv(col("n") + 1L, lit(2L)))
            .select(col("event_type"), col(v).as(out))
        }
        val med = lowerMedian(daily, "y", "med")
        val devs = daily.join(med, "event_type")
          .withColumn("dev", abs(col("y") - col("med")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val mad = lowerMedian(devs.select(col("event_type"), col("d"), col("dev").as("y")),
          "y", "mad")
        devs.join(mad, "event_type")
          .where(col("dev") > lit(3L) * col("mad"))
          .select(col("event_type"), col("d"), col("y"), col("med"),
            col("dev"), col("mad"))
          .orderBy(col("event_type"), col("d"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |daily AS (SELECT event_type, d, SUM(v_micro) AS y FROM e GROUP BY event_type, d),
              |medt AS (
              |  SELECT event_type, y AS med FROM (
              |    SELECT event_type, y, d,
              |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY y, d) AS rn,
              |      COUNT(*) OVER (PARTITION BY event_type) AS n
              |    FROM daily) WHERE rn = (n + 1) // 2),
              |devs AS (
              |  SELECT daily.event_type, d, y, med, ABS(y - med) AS dev
              |  FROM daily JOIN medt ON daily.event_type = medt.event_type),
              |madt AS (
              |  SELECT event_type, dev AS mad FROM (
              |    SELECT event_type, dev, d,
              |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, d) AS rn,
              |      COUNT(*) OVER (PARTITION BY event_type) AS n
              |    FROM devs) WHERE rn = (n + 1) // 2)
              |SELECT devs.event_type, d, y, med, dev, mad
              |FROM devs JOIN madt ON devs.event_type = madt.event_type
              |WHERE dev > 3 * mad
              |ORDER BY devs.event_type, d""".stripMargin)),

    // q210 — ORDER→FIRST-SHIP LATENCY SLA per priority: days from order
    // date to the EARLIEST lineitem ship date, profiled as exact
    // rank-selected p50/p90 (rank = ⌈p·n⌉, the q190/q199 selection rule
    // — no interpolation, engine-identical) plus the max. The ops
    // question every warehouse asks of its order pipeline.
    //
    // Shape at 100 TB: one orderkey-hash aggregate for first-ship, one
    // broadcastable join back to orders (orders is the smaller side
    // per-key), one priority-partitioned sort for the rank selection —
    // 5 priority partitions, each sorted locally.
    Declared("q210_ship_latency",
      (s, dir) => {
        val firstShip = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_orderkey")).agg(min(col("l_shipdate")).as("ship0"))
        val lat = Tables.load(s, dir, "orders")
          .join(firstShip, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderpriority").as("pri"),
            // floorDiv, not idiv: latencies go NEGATIVE (the synthetic
            // fixture draws ship dates independently of order dates) and
            // DuckDB's // floors while Spark's div truncates — they only
            // agree below zero on exact multiples. floorDiv matches the
            // oracle for ANY µs difference, aligned or not.
            graft.functions.ColumnOps.floorDiv(
              unix_micros(col("ship0")) - unix_micros(col("o_orderdate")),
              Day).as("lat_d"),
            col("o_orderkey"))
        val wr = Window.partitionBy(col("pri")).orderBy(col("lat_d"), col("o_orderkey"))
        val ranked = lat
          .withColumn("rn", row_number().over(wr))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("pri"))))
        ranked.groupBy(col("pri"))
          .agg(big(max(col("n"))).as("n_orders"),
            max(when(col("rn") === idiv(col("n") + 1L, lit(2L)), col("lat_d")))
              .as("p50_d"),
            max(when(col("rn") === idiv(lit(9L) * col("n") + 9L, lit(10L)), col("lat_d")))
              .as("p90_d"),
            max(col("lat_d")).as("max_d"))
          .orderBy(col("pri"))
      },
      Some(s"""WITH fs AS (
              |  SELECT l_orderkey, MIN(l_shipdate) AS ship0 FROM lineitem
              |  GROUP BY l_orderkey),
              |lat AS (
              |  SELECT o_orderpriority AS pri,
              |    (epoch_us(ship0) - epoch_us(o_orderdate)) // $Day AS lat_d,
              |    o_orderkey
              |  FROM orders JOIN fs ON o_orderkey = l_orderkey),
              |rk AS (
              |  SELECT pri, lat_d,
              |    ROW_NUMBER() OVER (PARTITION BY pri ORDER BY lat_d, o_orderkey) AS rn,
              |    COUNT(*) OVER (PARTITION BY pri) AS n
              |  FROM lat)
              |SELECT pri, CAST(MAX(n) AS BIGINT) AS n_orders,
              |  MAX(CASE WHEN rn = (n + 1) // 2 THEN lat_d END) AS p50_d,
              |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lat_d END) AS p90_d,
              |  MAX(lat_d) AS max_d
              |FROM rk GROUP BY pri ORDER BY pri""".stripMargin)),

    // q216 — EXACT MANN-WHITNEY U / AUC: do purchase values stochastically
    // dominate view values? Everything in DOUBLED midranks so ties stay
    // integral: at value v with c₁+c₂ pooled occurrences after `before`
    // smaller ones, each occurrence's doubled midrank is
    // 2·before + (c₁+c₂) + 1; summing c₁ of them gives group-1's doubled
    // rank sum, and 2·U₁ = 2ΣR₁ − n₁(n₁+1). The common-language effect
    // size U₁/(n₁n₂) IS the AUC of "value separates purchase from view" —
    // the exact-integer version of the ranking metric every classifier
    // eval needs.
    //
    // Shape at 100 TB: one distinct-value aggregate (value-keyed), ONE
    // GlobalCumSum range pass for the pooled prefix counts (no
    // partition-less window), then a 1-row rollup.
    Declared("q216_mann_whitney",
      (s, dir) => {
        val pv = tape(s, dir)
          .where(col("event_type").isin("purchase", "view"))
          .groupBy(col("v_micro"))
          .agg(
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c1"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
        val cum = GlobalCumSum.withCumSum(pv, Seq(col("v_micro")),
          col("c1") + col("c2"), "cum")
          .withColumn("before", col("cum") - col("c1") - col("c2"))
          .withColumn("contrib",
            col("c1") * (lit(2L) * col("before") + col("c1") + col("c2") + 1L))
        cum.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
            sum(col("contrib")).as("s2r1"))
          .select(big(col("n1")).as("n1"), big(col("n2")).as("n2"),
            (col("s2r1") - col("n1") * (col("n1") + 1L)).as("u_doubled"),
            ppm(col("s2r1") - col("n1") * (col("n1") + 1L),
              lit(2L) * col("n1") * col("n2")).as("auc_ppm"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |pv AS (
              |  SELECT v_micro,
              |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c1,
              |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
              |  FROM e WHERE event_type IN ('purchase', 'view')
              |  GROUP BY v_micro),
              |cum AS (
              |  SELECT *, SUM(c1 + c2) OVER (ORDER BY v_micro) AS cum FROM pv),
              |m AS (
              |  SELECT SUM(c1) AS n1, SUM(c2) AS n2,
              |    SUM(c1 * (2 * (cum - c1 - c2) + c1 + c2 + 1)) AS s2r1
              |  FROM cum)
              |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
              |  s2r1 - n1 * (n1 + 1) AS u_doubled,
              |  1000000 * (s2r1 - n1 * (n1 + 1)) // (2 * n1 * n2) AS auc_ppm
              |FROM m""".stripMargin)),

    // q217 — SPEARMAN RANK CORRELATION between the daily purchase and view
    // totals: rank-transform each series (doubled midranks via a
    // broadcast theta self-join — the q203 counter-frame recipe, no
    // partition-less window), then the classic ρ = 1 − 6Σd²/(n(n²−1)) in
    // exact integers (d² carried ×4; signed division via the signum/abs
    // pattern — Spark div truncates, DuckDB // floors, they agree only on
    // |num|). Midrank d² without tie correction is this query's STATED
    // semantics (exact for tie-free series; daily µ-sums never tie in the
    // fixture), documented rather than silently approximated.
    //
    // Shape at 100 TB: the fact collapses to ~days rows in ONE aggregate;
    // everything after is counter-sized broadcast arithmetic.
    Declared("q217_spearman",
      (s, dir) => {
        val daily = tape(s, dir)
          .where(col("event_type").isin("purchase", "view"))
          .groupBy(col("d"))
          .agg(
            sum(when(col("event_type") === "purchase", col("v_micro"))
              .otherwise(0L)).as("y1"),
            sum(when(col("event_type") === "view", col("v_micro"))
              .otherwise(0L)).as("y2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def rank2(y: String, out: String) =
          daily.as("a").join(broadcast(daily.as("b")), lit(true), "left")
            .groupBy(col(s"a.d").as("d"), col(s"a.$y").as(y))
            .agg((lit(2L) * sum(when(col(s"b.$y") < col(s"a.$y"), 1L).otherwise(0L)) +
              sum(when(col(s"b.$y") === col(s"a.$y"), 1L).otherwise(0L)) + 1L).as(out))
            .select(col("d"), col(out))
        val ranked = rank2("y1", "r1x2").join(rank2("y2", "r2x2"), "d")
        val dd = ranked
          .withColumn("d2x4",
            (col("r1x2") - col("r2x2")) * (col("r1x2") - col("r2x2")))
        dd.agg(count(lit(1)).as("n"), sum(col("d2x4")).as("sd4"))
          .select(big(col("n")).as("n_days"),
            (signum(lit(4L) * col("n") * (col("n") * col("n") - 1L) - lit(6L) * col("sd4"))
              .cast("long") *
              ppm(abs(lit(4L) * col("n") * (col("n") * col("n") - 1L) - lit(6L) * col("sd4")),
                lit(4L) * col("n") * (col("n") * col("n") - 1L)))
              .as("rho_ppm"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |daily AS (
              |  SELECT d,
              |    SUM(CASE WHEN event_type = 'purchase' THEN v_micro ELSE 0 END) AS y1,
              |    SUM(CASE WHEN event_type = 'view' THEN v_micro ELSE 0 END) AS y2
              |  FROM e WHERE event_type IN ('purchase', 'view') GROUP BY d),
              |r1 AS (
              |  SELECT a.d, 2 * SUM(CASE WHEN b.y1 < a.y1 THEN 1 ELSE 0 END)
              |    + SUM(CASE WHEN b.y1 = a.y1 THEN 1 ELSE 0 END) + 1 AS r1x2
              |  FROM daily a CROSS JOIN daily b GROUP BY a.d, a.y1),
              |r2 AS (
              |  SELECT a.d, 2 * SUM(CASE WHEN b.y2 < a.y2 THEN 1 ELSE 0 END)
              |    + SUM(CASE WHEN b.y2 = a.y2 THEN 1 ELSE 0 END) + 1 AS r2x2
              |  FROM daily a CROSS JOIN daily b GROUP BY a.d, a.y2),
              |m AS (
              |  SELECT COUNT(*) AS n, SUM((r1x2 - r2x2) * (r1x2 - r2x2)) AS sd4
              |  FROM r1 JOIN r2 USING (d))
              |SELECT CAST(n AS BIGINT) AS n_days,
              |  CAST(SIGN(4 * n * (n * n - 1) - 6 * sd4) AS BIGINT)
              |    * (1000000 * ABS(4 * n * (n * n - 1) - 6 * sd4)
              |       // (4 * n * (n * n - 1))) AS rho_ppm
              |FROM m""".stripMargin)),

    // q218 — KENDALL τ-a between the same daily series: C − D =
    // Σ_{i<j} sign(Δy1)·sign(Δy2) over day pairs, τ = (C−D)/(n(n−1)/2).
    // Rank-free and therefore exactly integral; τ-a (no tie correction —
    // tie corrections need sqrt) is the stated semantics, exact for the
    // tie-free daily µ-totals. The day table is counter-sized, so the
    // pair join is a broadcast theta join on ~n²/2 counter rows — the
    // q203/q217 counter-frame recipe, never a fact-sized product.
    Declared("q218_kendall",
      (s, dir) => {
        val daily = tape(s, dir)
          .where(col("event_type").isin("purchase", "view"))
          .groupBy(col("d"))
          .agg(
            sum(when(col("event_type") === "purchase", col("v_micro"))
              .otherwise(0L)).as("y1"),
            sum(when(col("event_type") === "view", col("v_micro"))
              .otherwise(0L)).as("y2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pairs = daily.as("a").join(broadcast(daily.as("b")),
            col("a.d") < col("b.d"))
          .select((signum(col("b.y1") - col("a.y1")) *
            signum(col("b.y2") - col("a.y2"))).cast("long").as("cd"))
        pairs.agg(count(lit(1)).as("np"), sum(col("cd")).as("cmd"))
          .select(big(col("np")).as("n_pairs"),
            col("cmd").as("c_minus_d"),
            (signum(col("cmd")).cast("long") *
              ppm(abs(col("cmd")), col("np")))
              .as("tau_ppm"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |daily AS (
              |  SELECT d,
              |    SUM(CASE WHEN event_type = 'purchase' THEN v_micro ELSE 0 END) AS y1,
              |    SUM(CASE WHEN event_type = 'view' THEN v_micro ELSE 0 END) AS y2
              |  FROM e WHERE event_type IN ('purchase', 'view') GROUP BY d),
              |p AS (
              |  SELECT SIGN(b.y1 - a.y1) * SIGN(b.y2 - a.y2) AS cd
              |  FROM daily a JOIN daily b ON a.d < b.d),
              |m AS (SELECT COUNT(*) AS np, CAST(SUM(cd) AS BIGINT) AS cmd FROM p)
              |SELECT CAST(np AS BIGINT) AS n_pairs, cmd AS c_minus_d,
              |  CAST(SIGN(cmd) AS BIGINT) * (1000000 * ABS(cmd) // np) AS tau_ppm
              |FROM m""".stripMargin)),

    // q219 — PAIRED SIGN-FLIP PERMUTATION TEST (deterministic): is the
    // daily purchase−view difference centered at zero? Each of 200
    // resamples flips every day's diff by an md5-derived ±1 (the q192
    // derandomized-resampling discipline: the p-value is a PURE FUNCTION
    // of the data — no RNG, no seed plumbing, retries/AQE cannot move
    // it). p = (1 + #{|T_r| ≥ |T_obs|}) / (R + 1), the add-one
    // permutation convention, in exact ppm.
    //
    // Shape at 100 TB: the fact collapses to days in ONE aggregate; the
    // ×200 explode multiplies counters only; T_obs rides a 1-row
    // broadcast into the resample rollup.
    Declared("q219_perm_test",
      (s, dir) => {
        val diff = tape(s, dir)
          .where(col("event_type").isin("purchase", "view"))
          .groupBy(col("d"))
          .agg(sum(when(col("event_type") === "purchase", col("v_micro"))
            .otherwise(-col("v_micro"))).as("x"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val obs = diff.agg(abs(sum(col("x"))).as("t_obs"),
          count(lit(1)).as("n_days"))
        val resamples = diff
          .select(col("d"), col("x"), explode(sequence(lit(1L), lit(200L))).as("r"))
          .withColumn("sgn",
            lit(1L) - lit(2L) * (conv(substring(
              md5(concat_ws(":", col("d"), col("r"))), 1, 8), 16, 10).cast("long") % 2L))
          .groupBy(col("r")).agg(abs(sum(col("sgn") * col("x"))).as("t_r"))
        resamples.crossJoin(broadcast(obs))
          .agg(max(col("n_days")).as("nd"), max(col("t_obs")).as("t"),
            sum(when(col("t_r") >= col("t_obs"), 1L).otherwise(0L)).as("n_ge"))
          .select(big(col("nd")).as("n_days"), col("t").as("t_obs_micro"),
            big(col("n_ge")).as("n_ge"),
            ppm(col("n_ge") + 1L, lit(201L)).as("p_ppm"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |diff AS (
              |  SELECT d, SUM(CASE WHEN event_type = 'purchase' THEN v_micro
              |                     ELSE -v_micro END) AS x
              |  FROM e WHERE event_type IN ('purchase', 'view') GROUP BY d),
              |obs AS (SELECT ABS(SUM(x)) AS t_obs, COUNT(*) AS n_days FROM diff),
              |rs AS (SELECT d, x, UNNEST(RANGE(1, 201)) AS r FROM diff),
              |fl AS (
              |  SELECT r, ABS(SUM((1 - 2 * (CAST(('0x' || SUBSTR(md5(d || ':' || r), 1, 8)) AS BIGINT) % 2)) * x)) AS t_r
              |  FROM rs GROUP BY r)
              |SELECT CAST(MAX(n_days) AS BIGINT) AS n_days, MAX(t_obs) AS t_obs_micro,
              |  CAST(SUM(CASE WHEN t_r >= t_obs THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
              |  1000000 * (SUM(CASE WHEN t_r >= t_obs THEN 1 ELSE 0 END) + 1) // 201 AS p_ppm
              |FROM fl CROSS JOIN obs""".stripMargin)),

    // q220 — LEAD-LAG CONCORDANCE PROFILE: does purchase activity LEAD
    // view activity (or vice versa)? Kendall τ-a between y1_d and
    // y2_{d+lag} for lags −3..3 — the sign-product machinery of q218
    // swept across an explicit (d, d+lag) self-join per lag (gap-safe
    // like q193: a missing day kills the pair, never mis-shifts it). The
    // lag with max |τ| names the leader. All counter-sized after the
    // daily rollup; the lag spine is a 7-literal explode.
    Declared("q220_lead_lag",
      (s, dir) => {
        val daily = tape(s, dir)
          .where(col("event_type").isin("purchase", "view"))
          .groupBy(col("d"))
          .agg(
            sum(when(col("event_type") === "purchase", col("v_micro"))
              .otherwise(0L)).as("y1"),
            sum(when(col("event_type") === "view", col("v_micro"))
              .otherwise(0L)).as("y2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val lags = daily
          .select(col("d"), col("y1"), explode(sequence(lit(-3L), lit(3L))).as("lag"))
          .join(daily.select(col("d").as("d2"), col("y2")),
            col("d2") === col("d") + col("lag"))
        val pairs = lags.as("a").join(broadcast(lags.as("b")),
            col("a.lag") === col("b.lag") && col("a.d") < col("b.d"))
          .select(col("a.lag").as("lag"),
            (signum(col("b.y1") - col("a.y1")) *
              signum(col("b.y2") - col("a.y2"))).cast("long").as("cd"))
        pairs.groupBy(col("lag"))
          .agg(big(count(lit(1))).as("n_pairs"), sum(col("cd")).as("cmd"))
          .select(col("lag"), col("n_pairs"), col("cmd").as("c_minus_d"),
            (signum(col("cmd")).cast("long") *
              ppm(abs(col("cmd")), col("n_pairs")))
              .as("tau_ppm"))
          .orderBy(col("lag"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |daily AS (
              |  SELECT d,
              |    SUM(CASE WHEN event_type = 'purchase' THEN v_micro ELSE 0 END) AS y1,
              |    SUM(CASE WHEN event_type = 'view' THEN v_micro ELSE 0 END) AS y2
              |  FROM e WHERE event_type IN ('purchase', 'view') GROUP BY d),
              |lg AS (
              |  SELECT a.d, l.lag, a.y1, b.y2
              |  FROM daily a
              |  CROSS JOIN (SELECT UNNEST(RANGE(-3, 4)) AS lag) l
              |  JOIN daily b ON b.d = a.d + l.lag),
              |p AS (
              |  SELECT a.lag, SIGN(b.y1 - a.y1) * SIGN(b.y2 - a.y2) AS cd
              |  FROM lg a JOIN lg b ON a.lag = b.lag AND a.d < b.d),
              |m AS (SELECT lag, COUNT(*) AS np, CAST(SUM(cd) AS BIGINT) AS cmd
              |      FROM p GROUP BY lag)
              |SELECT lag, CAST(np AS BIGINT) AS n_pairs, cmd AS c_minus_d,
              |  CAST(SIGN(cmd) AS BIGINT) * (1000000 * ABS(cmd) // np) AS tau_ppm
              |FROM m ORDER BY lag""".stripMargin)),

    // q223 — DECILE LIFT CURVE: treat value as a model score and
    // purchase as the positive label; rank ALL events by score
    // (GlobalRank NTILE(10) — q197's no-single-partition tiling), then
    // per decile the positive rate and LIFT vs the base rate, both in
    // exact ppm via ONE cross-multiplied division
    // (lift = pos·n_total / (n·pos_total) — never two stacked floors).
    // The campaign-targeting readout: "decile 1 converts at k× base".
    //
    // Shape at 100 TB: one GlobalRank range shuffle, a 10-group rollup,
    // and a 1-row broadcast of the corpus totals.
    Declared("q223_lift_curve",
      (s, dir) => {
        val ev = tape(s, dir)
          .select(col("v_micro"), col("event_id"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
        val tiled = GlobalRank.withRankColumns(
          ev, Seq(col("v_micro").desc, col("event_id")), tiles = 10)
        val tot = ev.agg(count(lit(1)).as("n_tot"), sum(col("pos")).as("pos_tot"))
        tiled.groupBy(col("tile"))
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("pos"))
          .crossJoin(broadcast(tot))
          .select(col("tile").as("decile"), big(col("n")).as("n"),
            big(col("pos")).as("n_pos"),
            ppm(col("pos"), col("n")).as("rate_ppm"),
            ppm(col("pos") * col("n_tot"),
              col("n") * col("pos_tot")).as("lift_ppm"))
          .orderBy(col("decile"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |sc AS (
              |  SELECT v_micro, event_id,
              |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
              |  FROM e),
              |t AS (
              |  SELECT *, NTILE(10) OVER (ORDER BY v_micro DESC, event_id) AS tile
              |  FROM sc),
              |tot AS (SELECT COUNT(*) AS n_tot, SUM(pos) AS pos_tot FROM sc)
              |SELECT tile AS decile, COUNT(*) AS n,
              |  CAST(SUM(pos) AS BIGINT) AS n_pos,
              |  1000000 * SUM(pos) // COUNT(*) AS rate_ppm,
              |  1000000 * SUM(pos) * MAX(n_tot) // (COUNT(*) * MAX(pos_tot)) AS lift_ppm
              |FROM t CROSS JOIN tot GROUP BY tile ORDER BY decile""".stripMargin)),

    // q225 — ROC CURVE AT DECILE THRESHOLDS: sweeping "flag the top-k
    // score deciles as positive", the exact (FPR, TPR) ppm at each of
    // the 10 operating points — the eval-family closer beside q216's
    // AUC (the area under THIS curve) and q223's lift. Cumulative
    // pos/neg counts ride the same q223 tiling; no second sort.
    Declared("q225_roc_points",
      (s, dir) => {
        val ev = tape(s, dir)
          .select(col("v_micro"), col("event_id"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
        val tiled = GlobalRank.withRankColumns(
          ev, Seq(col("v_micro").desc, col("event_id")), tiles = 10)
        val perTile = tiled.groupBy(col("tile"))
          .agg(sum(col("pos")).as("p"), sum(lit(1L) - col("pos")).as("ng"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // cumulative walk over the 10-row tile table as a broadcast
        // TRIANGULAR join (the q203 counter-frame recipe) — even the
        // counter stage carries no partition-less window, so the whole
        // query plans clean under PartitionlessWindowGuard
        val cum = perTile.as("a").join(broadcast(perTile.as("b")),
            col("b.tile") <= col("a.tile"))
          .groupBy(col("a.tile").as("tile"))
          .agg(sum(col("b.p")).as("cp"), sum(col("b.ng")).as("cn"))
        val tot = perTile.agg(sum(col("p")).as("pt"), sum(col("ng")).as("nt"))
        cum.crossJoin(broadcast(tot))
          .select(col("tile").as("decile"),
            big(col("cp")).as("cum_pos"), big(col("cn")).as("cum_neg"),
            ppm(col("cp"), col("pt")).as("tpr_ppm"),
            ppm(col("cn"), col("nt")).as("fpr_ppm"))
          .orderBy(col("decile"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |sc AS (
              |  SELECT v_micro, event_id,
              |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
              |  FROM e),
              |t AS (
              |  SELECT *, NTILE(10) OVER (ORDER BY v_micro DESC, event_id) AS tile
              |  FROM sc),
              |pt AS (
              |  SELECT tile, SUM(pos) AS p, SUM(1 - pos) AS ng
              |  FROM t GROUP BY tile),
              |c AS (
              |  SELECT tile, SUM(p) OVER (ORDER BY tile) AS cp,
              |    SUM(ng) OVER (ORDER BY tile) AS cn
              |  FROM pt),
              |tot AS (SELECT SUM(p) AS ptot, SUM(ng) AS ntot FROM pt)
              |SELECT tile AS decile, CAST(cp AS BIGINT) AS cum_pos,
              |  CAST(cn AS BIGINT) AS cum_neg,
              |  1000000 * cp // ptot AS tpr_ppm, 1000000 * cn // ntot AS fpr_ppm
              |FROM c CROSS JOIN tot ORDER BY decile""".stripMargin)),

    // q227 — INTER-ARRIVAL GAP PROFILE per event_type: the lag-1 µs gaps
    // of the event stream, profiled as exact rank-selected p50/p90/max —
    // the arrival-process diagnostic behind capacity planning and
    // anomaly thresholds (q159's σ gates assume you know the cadence;
    // this measures it). Gaps, ranks and picks all ride ONE
    // event_type-partitioned sort — the q175/q210 shape.
    Declared("q227_gap_profile",
      (s, dir) => {
        val wt = Window.partitionBy(col("event_type"))
          .orderBy(col("us"), col("event_id"))
        val gaps = tape(s, dir)
          .withColumn("gap", col("us") - lag(col("us"), 1).over(wt))
          .where(col("gap").isNotNull)
        val wr = Window.partitionBy(col("event_type"))
          .orderBy(col("gap"), col("us"), col("event_id"))
        val ranked = gaps
          .withColumn("rn", row_number().over(wr))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        ranked.groupBy(col("event_type"))
          .agg(big(max(col("n"))).as("n_gaps"),
            max(when(col("rn") === idiv(col("n") + 1L, lit(2L)), col("gap")))
              .as("p50_gap_us"),
            max(when(col("rn") === idiv(lit(9L) * col("n") + 9L, lit(10L)), col("gap")))
              .as("p90_gap_us"),
            max(col("gap")).as("max_gap_us"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH e AS ($tapeSql),
              |g AS (
              |  SELECT event_type, us, event_id,
              |    us - LAG(us) OVER (PARTITION BY event_type ORDER BY us, event_id) AS gap
              |  FROM e),
              |rk AS (
              |  SELECT event_type, gap,
              |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap, us, event_id) AS rn,
              |    COUNT(*) OVER (PARTITION BY event_type) AS n
              |  FROM g WHERE gap IS NOT NULL)
              |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
              |  MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS p50_gap_us,
              |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN gap END) AS p90_gap_us,
              |  MAX(gap) AS max_gap_us
              |FROM rk GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
