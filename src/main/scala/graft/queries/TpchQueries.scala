package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables

/** The canonical TPC-H workload, adapted to the fixture schema — the
  * "complete query engine" sweep. Shapes Q1/Q13/Q17/Q20/Q21/Q22 already
  * exist as q02/q113/q110/q120/q111/q112; this module adds the remaining
  * adaptable queries (the fixtures lack the ship/commit/receipt-date
  * triple, so Q4/Q9/Q16/Q19 are adapted to the columns that exist — each
  * adaptation is noted inline). Q2/Q11, blocked through round 9 on the
  * missing partsupp table, run since round 10 over a DETERMINISTIC
  * derived partsupp (see [[partsuppCte]]) — the correlated-min and
  * global-share HAVING shapes are what the sweep exists to pin, and both
  * engines derive the identical dim from the same closed form.
  *
  * Every query is ONE SQL text run verbatim on Spark (temp views over
  * Tables.load) and DuckDB (driver table registration), under the
  * determinism protocol: decimal casts at the leaves, ROUND(x,6) decimal
  * outputs, total ORDER BY, timestamps rendered via CAST(ts AS STRING)
  * (identical 'yyyy-MM-dd HH:mm:ss' rendering in both engines).
  *
  * Scale notes: these are the classic star-join/aggregation shapes the
  * engine's levers exist for — Catalyst broadcast selection (dims), AQE,
  * semi-join lowering for IN/EXISTS (DecorrelationSpec pins the family),
  * and TakeOrderedAndProject for the LIMIT queries. No custom operators
  * needed; that is the point of the sweep.
  */
object TpchQueries extends QueryModule {

  private val allTables =
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region", "part")

  private def run(s: SparkSession, dir: String, q: String): DataFrame = {
    allTables.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(q)
  }

  /** Q3: unshipped high-revenue BUILDING orders, top 10. */
  private val q121 =
    """SELECT l_orderkey,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 6) AS DECIMAL(18,6)) AS revenue,
      |  CAST(o_orderdate AS STRING) AS orderdate
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q4 (adapted: no commit/receipt dates — "late" = shipped >60 days after
    * order): order-priority checking via correlated EXISTS.
    */
  private val q122 =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q5: local-supplier revenue per ASIA nation (6-table star join with the
    * customer-nation = supplier-nation co-location predicate).
    */
  private val q123 =
    """SELECT n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 6) AS DECIMAL(18,6)) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Q6: forecast revenue change — pure scan+filter+agg, the pushdown
    * benchmark (the discount band is compared in exact decimal).
    */
  private val q124 =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND CAST(l_discount AS DECIMAL(18,6)) BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Q7: bilateral shipping volume between two nations by ship year (the
    * disjunctive two-nation predicate over a self-joined nation dim).
    */
  private val q125 =
    """SELECT supp_nation, cust_nation, l_year, CAST(ROUND(SUM(volume), 6) AS DECIMAL(18,6)) AS revenue FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      |    CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) AS volume
      |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |) shipping GROUP BY supp_nation, cust_nation, l_year ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q8: national market share within a region's PROMO volume by order
    * year — the 8-table join with a conditional-share division (rounded to
    * 6 dp immediately per the protocol).
    */
  private val q126 =
    """SELECT o_year,
      |  CAST(ROUND(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END) / SUM(volume), 6) AS DECIMAL(18,6)) AS mkt_share
      |FROM (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) AS volume,
      |    n2.n_name AS nation
      |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
      |    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey AND p_type = 'PROMO'
      |) all_nations GROUP BY o_year ORDER BY o_year""".stripMargin

  /** Q9 (adapted: no partsupp supplycost — profit = net revenue): product
    * profit by supplier nation and order year, part filtered by name.
    */
  private val q127 =
    """SELECT nation, o_year, CAST(ROUND(SUM(amount), 6) AS DECIMAL(18,6)) AS sum_profit FROM (
      |  SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) AS amount
      |  FROM part, supplier, lineitem, orders, nation
      |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
      |    AND s_nationkey = n_nationkey AND p_name LIKE '%widget%'
      |) profit GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin

  /** Q10: returned-item revenue per customer for a quarter, top 20. */
  private val q128 =
    """SELECT c_custkey, c_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 6) AS DECIMAL(18,6)) AS revenue,
      |  CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q14: promo revenue share for one month (conditional share ×100). */
  private val q129 =
    """SELECT CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN volume ELSE 0 END) * 100 / SUM(volume), 6) AS DECIMAL(18,6)) AS promo_revenue
      |FROM (
      |  SELECT p_type, CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) AS volume
      |  FROM lineitem, part
      |  WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00') x""".stripMargin

  /** Q15: top supplier(s) by quarterly revenue — CTE referenced twice plus
    * an uncorrelated scalar MAX gate.
    */
  private val q130 =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 6) AS DECIMAL(18,6)) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Q16 (adapted: supplier relationships derived from lineitem, exclusion
    * by balance instead of complaint comments): distinct-supplier counts
    * per part attribute with a NOT IN anti gate.
    */
  private val q131 =
    """SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1' AND p_size IN (1, 2, 3, 4, 5)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q18: large-volume customers — IN over a grouped HAVING subquery. */
  private val q132 =
    """SELECT c_name, c_custkey, o_orderkey,
      |  CAST(o_orderdate AS STRING) AS orderdate,
      |  CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS totalprice,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Q19 (adapted: no container column — brand/size/quantity bands):
    * disjunctive multi-band predicate over the part join.
    */
  private val q133 =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 6) AS DECIMAL(18,6)) AS revenue
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND (
      |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
      |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  /** Q12 (adapted: the fixture has no shipmode or commit/receipt dates —
    * mode proxy = `l_returnflag IN ('A','R')`, "late" = shipped more than
    * 30 days after the order, mirroring Q4's 60-day lateness adaptation):
    * shipping-mode priority counts — the two-way conditional aggregate over
    * the orders⨝lineitem join. Closes the last open slot of the TPC-H
    * sweep: all 22 query SHAPES now run (Q1/Q13/Q17/Q20/Q21/Q22 as
    * q02/q113/q110/q120/q111/q112, the rest in this module).
    */
  private val q260 =
    """SELECT l_returnflag AS shipmode,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey AND l_returnflag IN ('A', 'R')
      |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Deterministic derived `partsupp` — the fixture lacks the table, which
    * kept Q2/Q11 out of the sweep through round 9. The derivation is a
    * CLOSED FORM over (part × 4 supplier slots) both engines compute
    * identically: supplier stride FLOOR(n/4)+1 spreads a part's 4 slots
    * across the key space (distinct for every fixture supplier count:
    * 10/100/1000), availqty/supplycost are integer hash mixes (supplycost
    * an integer-valued DECIMAL so the Q2 correlated-MIN equality is
    * exact — no division anywhere: `/` is float division in BOTH engines,
    * `div` vs `//` would fork the text). This matches the dbgen IDEA
    * (partsupp is a deterministic expansion of part) without pretending to
    * replicate dbgen's RNG streams; what the sweep pins is the query
    * SHAPES — Q2's correlated min-cost subquery against a derived dim,
    * Q11's HAVING-over-global-share (cross-multiplied, division-free).
    */
  private val partsuppCte =
    """WITH sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    (p_partkey + i * (CAST(FLOOR(n / 4) AS BIGINT) + 1)) % n AS ps_suppkey,
      |    ((p_partkey * 31 + i * 7) % 999) + 1 AS ps_availqty,
      |    CAST((p_partkey * 53 + i * 11) % 90000 + 10000 AS DECIMAL(18,6)) AS ps_supplycost
      |  FROM part
      |  CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3) slots
      |  CROSS JOIN sc)""".stripMargin

  /** Q2: min-cost supplier per qualifying part in a region — the classic
    * correlated scalar subquery over the (derived) partsupp dim.
    */
  private val q256 = partsuppCte +
    """
      |SELECT CAST(ROUND(CAST(s_acctbal AS DECIMAL(18,6)), 6) AS DECIMAL(18,6)) AS s_acctbal,
      |  s_name, n_name, p_partkey, p_brand, ps_supplycost
      |FROM part, partsupp, supplier, nation, region
      |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      |  AND p_size <= 5 AND p_type = 'ECONOMY'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |  AND ps_supplycost = (
      |    SELECT MIN(ps2.ps_supplycost)
      |    FROM partsupp ps2, supplier s2, nation n2, region r2
      |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** Q11: parts whose two-nation inventory value exceeds a global share —
    * HAVING against a whole-table scalar, cross-multiplied so no division
    * ever happens (DuckDB decimal division degrades to DOUBLE).
    */
  private val q257 = partsuppCte +
    """,
      |vals AS (
      |  SELECT ps_partkey, SUM(ps_supplycost * ps_availqty) AS value
      |  FROM partsupp, supplier, nation
      |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_name IN ('NATION_7', 'NATION_8')
      |  GROUP BY ps_partkey),
      |tot AS (SELECT SUM(value) AS total FROM vals)
      |SELECT ps_partkey, CAST(ROUND(value, 6) AS DECIMAL(38,6)) AS value
      |FROM vals, tot
      |WHERE value * 1000 > total
      |ORDER BY value DESC, ps_partkey""".stripMargin

  override val declared: Seq[Declared] = Seq(
    "q121_tpch_q3" -> q121, "q122_tpch_q4" -> q122, "q123_tpch_q5" -> q123,
    "q124_tpch_q6" -> q124, "q125_tpch_q7" -> q125, "q126_tpch_q8" -> q126,
    "q127_tpch_q9" -> q127, "q128_tpch_q10" -> q128, "q129_tpch_q14" -> q129,
    "q130_tpch_q15" -> q130, "q131_tpch_q16" -> q131, "q132_tpch_q18" -> q132,
    "q133_tpch_q19" -> q133,
    "q256_tpch_q2" -> q256, "q257_tpch_q11" -> q257,
    "q260_tpch_q12" -> q260
  ).map { case (name, sql) =>
    Declared(name, (s, dir) => run(s, dir, sql), Some(sql))
  }
}
