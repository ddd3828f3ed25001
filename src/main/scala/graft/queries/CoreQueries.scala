package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import Protocol._

/** Declared queries Q01–Q21 (SURVEY §2.3): the relational surface implied by
  * the reference's Aurora MySQL 5.7 store (`start_all_pipeline.py:509-510`,
  * DDL at `start_all_pipeline.py:463-464`) plus the window/set-op extensions.
  *
  * Every query is written DataFrame-first so Catalyst plans it (predicate
  * pushdown, column pruning, partial aggregation, broadcast selection, AQE);
  * the paired SQL string is the DuckDB oracle, not the implementation.
  *
  * Scale notes (100 TB posture):
  *  - dimension joins (region/nation/customer at TPC-H ratios) are explicitly
  *    `broadcast()` so no shuffle of the fact side is required;
  *  - fact-fact joins shuffle on their join key only after filters/projections
  *    have been pushed below the exchange;
  *  - all aggregates are partial+final hash aggregates (map-side combine);
  *  - nothing collects to the driver.
  */
object CoreQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  override val declared: Seq[Declared] = Seq(

    // Q01 — scan + filter + project, exact decimal multiply.
    Declared("q01_filter_project",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_quantity") > 45)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            out6(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("net"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS net
             |FROM lineitem WHERE l_quantity > 45
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Q02 — partial+final hash aggregation (TPC-H Q1 shape).
    Declared("q02_agg",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            out6(sum(dec(col("l_quantity")))).as("sum_qty"),
            out6(sum(dec(col("l_extendedprice")))).as("sum_base"),
            out6(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("sum_disc"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS sum_qty,
             |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS sum_base,
             |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 6) AS DECIMAL(18,6)) AS sum_disc,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Q03 — top-k: Catalyst plans TakeOrderedAndProject (per-partition top-k
    // then merge on driver — no global sort of 100 TB).
    Declared("q03_topk",
      (s, dir) => {
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"), out6(col("o_totalprice")).as("o_totalprice"))
      },
      Some("""SELECT o_orderkey, CAST(ROUND(o_totalprice, 6) AS DECIMAL(18,6)) AS o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // Q04 — inner equi-join + aggregation; customer side broadcast (dim-ish
    // at TPC-H ratios customer:orders = 1:10).
    Declared("q04_join_agg",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(out6(sum(dec(col("o_totalprice")))).as("revenue"), count(lit(1)).as("n_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS revenue,
             |  COUNT(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Q05 — 3-way join + date_trunc to month; lineitem⋈orders shuffles on
    // orderkey, the customer side is broadcast.
    Declared("q05_join3_month",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(tdate(date_trunc("month", col("o_orderdate"))).as("month"))
          .agg(out6(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("revenue"))
          .orderBy(col("month"))
      },
      Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 6) AS DECIMAL(18,6)) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Q06 — classic broadcast dim-dim join.
    Declared("q06_dim_join",
      (s, dir) => {
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_nations"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name, COUNT(*) AS n_nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // Q07 — left outer join preserving zero-order customers; COUNT(o_orderkey)
    // counts only matched rows.
    Declared("q07_left_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // Q08 — left semi join (EXISTS).
    Declared("q08_semi_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // Q09 — left anti join (NOT EXISTS).
    Declared("q09_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // Q10 — multi-distinct aggregation (Catalyst Expand rewrite).
    Declared("q10_distinct_agg",
      (s, dir) => {
        t(s, dir, "lineitem")
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"))
      },
      Some("""SELECT COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps
             |FROM lineitem""".stripMargin)),

    // Q11 — HAVING over an exact-decimal aggregate.
    Declared("q11_having",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(dec(col("l_quantity"))).as("sq"))
          .filter(col("sq") > 150)
          .select(col("l_partkey"), out6(col("sq")).as("sum_qty"))
          .orderBy(col("l_partkey"))
      },
      Some("""SELECT l_partkey, CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS sum_qty
             |FROM lineitem GROUP BY l_partkey
             |HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
             |ORDER BY l_partkey""".stripMargin)),

    // Q12 — conditional aggregation (SUM(CASE …)) + ratio.
    Declared("q12_cond_agg",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_linestatus"))
          .agg(
            big(sum(when(col("l_returnflag") === "R", 1).otherwise(0))).as("n_returns"),
            count(lit(1)).as("n"),
            out6(dec(sum(when(col("l_returnflag") === "R", 1).otherwise(0))) / count(lit(1))).as("return_share"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
             |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returns,
             |  COUNT(*) AS n,
             |  CAST(ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DECIMAL(18,6)) / COUNT(*), 6) AS DECIMAL(18,6)) AS return_share
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // Q13 — string functions + LIKE filter.
    Declared("q13_string_fns",
      (s, dir) => {
        t(s, dir, "customer")
          .filter(col("c_name").like("%1%"))
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("uname"),
            substring(col("c_name"), 1, 5).as("pre"),
            big(length(col("c_mktsegment"))).as("seg_len"),
            concat(col("c_mktsegment"), lit("#"), col("c_name")).as("tag"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, UPPER(c_name) AS uname, SUBSTR(c_name, 1, 5) AS pre,
             |  CAST(LENGTH(c_mktsegment) AS BIGINT) AS seg_len,
             |  CONCAT(c_mktsegment, '#', c_name) AS tag
             |FROM customer WHERE c_name LIKE '%1%'
             |ORDER BY c_custkey""".stripMargin)),

    // Q14 — date part extraction.
    Declared("q14_date_extract",
      (s, dir) => {
        t(s, dir, "orders")
          .groupBy(big(year(col("o_orderdate"))).as("y"), big(month(col("o_orderdate"))).as("m"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("y"), col("m"))
      },
      Some("""SELECT EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(MONTH FROM o_orderdate) AS m,
             |  COUNT(*) AS n_orders
             |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Q15 — math functions with an exact global average (scalar "subquery"
    // realized as a broadcast single-row join; no driver-side collect).
    Declared("q15_math_fns",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val avg = o.agg(out6(sum(dec(col("o_totalprice"))) / count(lit(1))).as("avg_tp"))
        o.crossJoin(broadcast(avg))
          .select(
            col("o_orderkey"),
            out6(round(col("o_totalprice"), 0)).as("rounded"),
            big(floor(col("o_totalprice") / 10000)).as("bucket"),
            out6(abs(dec(col("o_totalprice")) - col("avg_tp"))).as("absdiff"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH a AS (SELECT CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) / COUNT(*), 6) AS DECIMAL(18,6)) AS avg_tp FROM orders)
             |SELECT o_orderkey,
             |  CAST(ROUND(ROUND(o_totalprice, 0), 6) AS DECIMAL(18,6)) AS rounded,
             |  CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS bucket,
             |  CAST(ROUND(ABS(CAST(o_totalprice AS DECIMAL(18,6)) - avg_tp), 6) AS DECIMAL(18,6)) AS absdiff
             |FROM orders, a ORDER BY o_orderkey""".stripMargin)),

    // Q16 — ranking window: top-3 orders per market segment.
    Declared("q16_window_rank",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", big(row_number().over(w)))
          .filter(col("rn") <= 3)
          .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
            out6(col("o_totalprice")).as("o_totalprice"))
          .orderBy(col("c_mktsegment"), col("rn"))
      },
      Some("""SELECT c_mktsegment, rn, o_orderkey, CAST(ROUND(o_totalprice, 6) AS DECIMAL(18,6)) AS o_totalprice
             |FROM (
             |  SELECT c_mktsegment, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |) WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin)),

    // Q17 — window frame (moving sum over 3 rows) + LAG delta on events.
    // AVG is expressed as SUM/COUNT over the frame so both engines stay in
    // exact decimal until the final 6-dp rounding.
    Declared("q17_window_frame",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val frame = w.rowsBetween(-2, 0)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), dec(col("value")).as("v"))
          .select(
            col("user_id"), col("event_id"), tmicro(col("ts")).as("ts"),
            out6(col("v")).as("value"),
            out6(sum(col("v")).over(frame) / count(lit(1)).over(frame)).as("mov_avg"),
            out6(col("v") - lag(col("v"), 1).over(w)).as("delta"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
             |  CAST(ROUND(v, 6) AS DECIMAL(18,6)) AS value,
             |  CAST(ROUND(SUM(v) OVER f / COUNT(*) OVER f, 6) AS DECIMAL(18,6)) AS mov_avg,
             |  CAST(ROUND(v - LAG(v, 1) OVER w, 6) AS DECIMAL(18,6)) AS delta
             |FROM (SELECT user_id, event_id, ts, CAST(value AS DECIMAL(18,6)) AS v FROM events)
             |WINDOW
             |  w AS (PARTITION BY user_id ORDER BY ts, event_id),
             |  f AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    // Q18 — ROLLUP + GROUPING flags (MySQL 5.7's WITH ROLLUP, generalized).
    Declared("q18_rollup",
      (s, dir) => {
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            out6(sum(dec(col("l_quantity")))).as("sum_qty"),
            count(lit(1)).as("n"),
            big(grouping(col("l_returnflag"))).as("g_rf"),
            big(grouping(col("l_linestatus"))).as("g_ls"))
          .select(col("l_returnflag"), col("l_linestatus"), col("g_rf"), col("g_ls"), col("sum_qty"), col("n"))
          .orderBy(col("g_rf"), col("g_ls"),
            col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
             |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
             |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS sum_qty,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // Q19a — CUBE.
    Declared("q19_cube",
      (s, dir) => {
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            big(grouping(col("o_orderstatus"))).as("g_st"),
            big(grouping(col("o_orderpriority"))).as("g_pr"))
          .select(col("o_orderstatus"), col("o_orderpriority"), col("g_st"), col("g_pr"), col("n"))
          .orderBy(col("g_st"), col("g_pr"),
            col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
             |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pr,
             |  COUNT(*) AS n
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // Q19b — explicit GROUPING SETS (SQL-only construct in Spark: issued via
    // spark.sql over a registered view; Catalyst plans the same Expand).
    Declared("q19_grouping_sets",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
                |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pr,
                |  COUNT(*) AS n
                |FROM orders
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                |ORDER BY g_st, g_pr, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
             |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pr,
             |  COUNT(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // Q20 — set operations (UNION / INTERSECT / EXCEPT, distinct semantics),
    // tagged into one result.
    Declared("q20_set_ops",
      (s, dir) => {
        val cu = t(s, dir, "customer").select(col("c_nationkey").as("k"))
        val su = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
        val u = cu.union(su).distinct().select(lit("union").as("op"), col("k"))
        val i = cu.intersect(su).select(lit("intersect").as("op"), col("k"))
        val e = cu.except(su).select(lit("except").as("op"), col("k"))
        u.unionByName(i).unionByName(e).orderBy(col("op"), col("k"))
      },
      Some("""WITH cu AS (SELECT c_nationkey AS k FROM customer),
             |     su AS (SELECT s_nationkey AS k FROM supplier)
             |SELECT 'union' AS op, k FROM (SELECT k FROM cu UNION SELECT k FROM su)
             |UNION ALL SELECT 'intersect' AS op, k FROM (SELECT k FROM cu INTERSECT SELECT k FROM su)
             |UNION ALL SELECT 'except' AS op, k FROM (SELECT k FROM cu EXCEPT SELECT k FROM su)
             |ORDER BY op, k""".stripMargin)),

    // Q21 — scalar subquery (global average, broadcast) + IN subquery
    // (planned as a left-semi join).
    Declared("q21_subquery",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val avg = o.agg(out6(sum(dec(col("o_totalprice"))) / count(lit(1))).as("avg_tp"))
        val bld = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        o.crossJoin(broadcast(avg))
          .filter(dec(col("o_totalprice")) > col("avg_tp"))
          .join(broadcast(bld), o("o_custkey") === bld("c_custkey"), "left_semi")
          .select(col("o_orderkey"), col("o_custkey"), out6(col("o_totalprice")).as("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, CAST(ROUND(o_totalprice, 6) AS DECIMAL(18,6)) AS o_totalprice
             |FROM orders
             |WHERE CAST(o_totalprice AS DECIMAL(18,6)) >
             |      (SELECT CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) / COUNT(*), 6) AS DECIMAL(18,6)) FROM orders)
             |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
             |ORDER BY o_orderkey""".stripMargin))
  )
}
