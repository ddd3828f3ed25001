package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Tables
import Protocol._

/** Gap-closure queries from the SURVEY §2.2 matrix rows not yet exercised by
  * Q01–q41: right/full outer joins, theta (non-equi) joins, regex functions,
  * date arithmetic, sliding windows.
  */
object CoverageQueries extends QueryModule {

  override val declared: Seq[Declared] = Seq(

    // q42 — right + full outer joins (MySQL 5.7 has RIGHT but emulates FULL
    // via UNION; the engine does both natively). supplier⟗nation keyed so
    // both unmatched sides exist: nations with no supplier (right-only) and
    // none-lost suppliers.
    Declared("q42_outer_joins",
      (s, dir) => {
        val sup = Tables.load(s, dir, "supplier")
          .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
        val nat = Tables.load(s, dir, "nation")
        sup.join(nat, sup("s_nationkey") === nat("n_nationkey"), "full")
          .select(
            col("n_nationkey"), col("n_name"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"),
            when(col("s_nationkey").isNull, lit("nation_only"))
              .when(col("n_nationkey").isNull, lit("supplier_only"))
              .otherwise(lit("both")).as("side"))
          .orderBy(col("n_nationkey").asc_nulls_first, col("n_supp"))
      },
      Some("""SELECT n_nationkey, n_name, COALESCE(n_supp, 0) AS n_supp,
             |  CASE WHEN s_nationkey IS NULL THEN 'nation_only'
             |       WHEN n_nationkey IS NULL THEN 'supplier_only'
             |       ELSE 'both' END AS side
             |FROM (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) sup
             |FULL JOIN nation ON s_nationkey = n_nationkey
             |ORDER BY n_nationkey NULLS FIRST, n_supp""".stripMargin)),

    // q43 — theta join: equi component (nationkey) + non-equi residual
    // (supplier out-earns customer). Catalyst plans hash join on the equi
    // part with the residual as filter — the shape that survives scale.
    Declared("q43_theta_join",
      (s, dir) => {
        val sup = Tables.load(s, dir, "supplier")
        val cus = Tables.load(s, dir, "customer")
        sup.join(cus, sup("s_nationkey") === cus("c_nationkey")
            && sup("s_acctbal") > cus("c_acctbal"))
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_poorer_customers"),
            out6(max(dec(col("c_acctbal")))).as("max_poorer_bal"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, COUNT(*) AS n_poorer_customers,
             |  CAST(ROUND(MAX(CAST(c_acctbal AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS max_poorer_bal
             |FROM supplier JOIN customer
             |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
             |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin)),

    // q44 — regex + date arithmetic over parts/orders.
    Declared("q44_regex_datearith",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .filter(col("o_orderpriority").rlike("^[12]-"))
          .select(
            col("o_orderkey"),
            regexp_extract(col("o_orderpriority"), "^(\\d)-(\\w+)", 2).as("prio_word"),
            tdate(date_add(col("o_orderdate"), 30)).as("due"),
            big(datediff(lit("1998-12-31").cast("date"), col("o_orderdate"))).as("age_days"),
            // whole-month difference — portable, unlike months_between whose
            // end-of-month fraction rules differ between engines
            big(lit(1998 * 12 + 12) - (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))))
              .as("age_months"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  regexp_extract(o_orderpriority, '^(\d)-(\w+)', 2) AS prio_word,
             |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due,
             |  CAST(datediff('day', o_orderdate, DATE '1998-12-31') AS BIGINT) AS age_days,
             |  CAST(23988 - (EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate)) AS BIGINT) AS age_months
             |FROM orders WHERE regexp_matches(o_orderpriority, '^[12]-')
             |ORDER BY o_orderkey""".stripMargin)),

    // q48 — the remaining ranking/analytic window functions from §2.2:
    // NTILE, PERCENT_RANK, CUME_DIST, FIRST_VALUE over the supplier table
    // (unique s_acctbal ordering tiebroken by s_suppkey for determinism).
    // A bare Window.orderBy would move the whole table to ONE partition;
    // operators.GlobalRank computes the same columns from a range-partitioned
    // sort + broadcast prefix offsets (no single-partition stage), and
    // FIRST_VALUE over the full order is the global argmax — a 1-row
    // broadcast, not a window.
    Declared("q48_ranking_extras",
      (s, dir) => {
        val sup = Tables.load(s, dir, "supplier").select(col("s_suppkey"), col("s_acctbal"))
        val ranked = graft.operators.GlobalRank.withRankColumns(
          sup, Seq(col("s_acctbal").desc, col("s_suppkey")), tiles = 4)
        val richest = sup.agg(
          max_by(col("s_suppkey"), struct(col("s_acctbal"), negate(col("s_suppkey")))).as("richest"))
        ranked.crossJoin(broadcast(richest))
          .select(
            col("s_suppkey"),
            out6(col("s_acctbal")).as("bal"),
            big(col("tile")).as("quartile"),
            out6(col("pr")).as("pr"),
            out6(col("cd")).as("cd"),
            col("richest"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, CAST(ROUND(s_acctbal, 6) AS DECIMAL(18,6)) AS bal,
             |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
             |  CAST(ROUND(PERCENT_RANK() OVER w, 6) AS DECIMAL(18,6)) AS pr,
             |  CAST(ROUND(CUME_DIST() OVER w, 6) AS DECIMAL(18,6)) AS cd,
             |  FIRST_VALUE(s_suppkey) OVER w AS richest
             |FROM supplier
             |WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
             |ORDER BY s_suppkey""".stripMargin)),

    // q45 — sliding windows (10-minute window, 1-minute slide) in batch:
    // every event lands in 10 windows. Spark assigns via window(); the
    // oracle reproduces the assignment by exploding the 10 offsets.
    Declared("q45_sliding_window",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "10 minutes", "1 minute").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(tsec(col("w.start")).as("w_start"), col("event_type"), col("n"))
          .orderBy(col("w_start"), col("event_type"))
      },
      Some("""SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start, event_type, COUNT(*) AS n
             |FROM (
             |  SELECT date_trunc('minute', ts) - to_minutes(k) AS w_start, event_type
             |  FROM events CROSS JOIN (SELECT unnest(range(0, 10)) AS k) offs
             |)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // q140 — NTILE decile statistics: equal-frequency bucketing of the
    // value distribution per event type (feature binning / percentile
    // banding). The tie-break on event_id makes the NTILE assignment a
    // total order — bit-identical bucket membership on both engines (an
    // ORDER BY value alone would leave tied rows engine-dependent).
    // min/max carry no arithmetic, so doubles are hash-safe as-is.
    // Scale shape: one window per event_type partition (bounded fan-in),
    // then a (type, decile)-keyed counter aggregate — 10·|types| rows out.
    Declared("q140_ntile_deciles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
        Tables.load(s, dir, "events")
          .select(col("event_type"), col("value"), col("event_id"))
          .withColumn("decile", ntile(10).over(w))
          .groupBy(col("event_type"), col("decile"))
          .agg(big(count(lit(1))).as("n"), min(col("value")).as("lo"), max(col("value")).as("hi"))
          .select(col("event_type"), big(col("decile")).as("decile"), col("n"), col("lo"), col("hi"))
          .orderBy(col("event_type"), col("decile"))
      },
      Some("""WITH t AS (SELECT event_type, value,
             |  NTILE(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS dec
             |  FROM events)
             |SELECT event_type, CAST(dec AS BIGINT) AS decile, CAST(COUNT(*) AS BIGINT) AS n,
             |  MIN(value) AS lo, MAX(value) AS hi
             |FROM t GROUP BY 1,2 ORDER BY event_type, decile""".stripMargin)),

    // q141 — ordered string aggregation (LISTAGG ... WITHIN GROUP, the
    // SQL:2016 surface; Spark 4's ListAgg vs DuckDB's ordered string_agg):
    // per-nation roster of top-balance customers. The inner top-3 keeps the
    // concatenated payload bounded — the pattern a report/export layer uses
    // so the aggregate string can never grow fact-sized; the WITHIN GROUP
    // order makes the concatenation deterministic on both engines.
    Declared("q141_listagg_roster",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_name"))
        val top = c.select(col("c_nationkey"), col("c_name"), col("c_acctbal"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
        top.join(broadcast(n), top("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(expr("listagg(c_name, ',') within group (order by c_name)").as("roster"))
          .orderBy(col("n_name"))
      },
      Some("""WITH top AS (SELECT c_nationkey, c_name,
             |  ROW_NUMBER() OVER (PARTITION BY c_nationkey
             |                     ORDER BY c_acctbal DESC, c_name) AS rk
             |  FROM customer)
             |SELECT n.n_name, string_agg(t.c_name, ',' ORDER BY t.c_name) AS roster
             |FROM top t JOIN nation n ON t.c_nationkey = n.n_nationkey
             |WHERE t.rk <= 3
             |GROUP BY n.n_name ORDER BY n_name""".stripMargin)),

    // q142 — ISO-8601 calendar aggregation: order volume per ISO
    // (year-of-week, week). The cross-engine trap this pins: calendar
    // weeks straddle year boundaries, so YEAR(ts) + WEEKOFYEAR(ts) is
    // WRONG at the edges (a Dec-29 order can belong to week 1 of the NEXT
    // ISO year) — Spark's extract(YEAROFWEEK) and DuckDB's isoyear() agree
    // on the ISO semantics, and the oracle match proves it over every
    // boundary in the data. One scan, one counter-sized aggregate.
    Declared("q142_iso_calendar",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .groupBy(
            expr("extract(YEAROFWEEK FROM o_orderdate)").cast("long").as("iso_year"),
            weekofyear(col("o_orderdate")).cast("long").as("iso_week"))
          .agg(big(count(lit(1))).as("n_orders"),
            out6(sum(dec(col("o_totalprice")))).as("total"))
          .orderBy(col("iso_year"), col("iso_week"))
      },
      Some("""SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
             |  CAST(week(o_orderdate) AS BIGINT) AS iso_week,
             |  CAST(COUNT(*) AS BIGINT) AS n_orders,
             |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS total
             |FROM orders GROUP BY 1, 2 ORDER BY iso_year, iso_week""".stripMargin)),

    // q143 — higher-order array lambdas over the embedding column
    // (filter / transform / aggregate / array_max vs DuckDB's list_filter /
    // list_transform / list_sum / list_max): positive-component count, L1
    // norm, and max |x| per vector. All three run INSIDE the row — no
    // explode, no shuffle, codegen'd lambda evaluation over the raw array;
    // the decimal leaf cast keeps the reductions exact and order-free.
    // CAST PARITY TRAP (found the hard way): DuckDB casts REAL→DECIMAL via
    // the float's SHORTEST decimal repr — a 7-digit repr like "0.0577865"
    // is an exact 6-dp halfway and rounds half-even DOWN, while Spark
    // rounds the widened double (…501944…) UP. Routing the oracle cast
    // through DOUBLE first makes both engines round the same 17-digit
    // value, where a 6-dp halfway cannot occur for generic data.
    Declared("q143_array_lambdas",
      (s, dir) => {
        val absDec = transform(col("embedding"), x => abs(x.cast(D)))
        Tables.load(s, dir, "embeddings")
          .select(col("vec_id"),
            size(filter(col("embedding"), x => x > 0f)).cast("long").as("n_pos"),
            out6(aggregate(absDec, lit(0).cast(DecimalType(38, 6)),
              (acc, x) => acc + x)).as("l1"),
            out6(array_max(absDec)).as("max_abs"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id,
             |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
             |  CAST(ROUND(list_sum(list_transform(embedding, x -> ABS(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))))), 6) AS DECIMAL(18,6)) AS l1,
             |  CAST(ROUND(list_max(list_transform(embedding, x -> ABS(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))))), 6) AS DECIMAL(18,6)) AS max_abs
             |FROM embeddings ORDER BY vec_id""".stripMargin))
  )
}
