package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables

/** TPC-H-shaped correlated-subquery queries (Q17/Q21/Q22/Q13 adapted to the
  * fixture columns) — the decorrelation workout the declared set lacked.
  * Correlated scalar aggregates and double EXISTS/NOT-EXISTS with key
  * inequality are the canonical stress tests for Catalyst's subquery
  * rewrite stack (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery):
  * a naive engine evaluates the inner query per outer row; Catalyst must
  * turn each into ONE aggregate + join (semi/anti for EXISTS), which is the
  * only shape that survives 100 TB. DecorrelationSpec pins exactly that —
  * no per-row subquery nodes in the physical plan, EXISTS pairs as one
  * semi + one anti join.
  *
  * The SAME SQL text runs on both engines (Spark via temp views over
  * Tables.load, DuckDB via the driver's table registration), so the oracle
  * can never drift from the declared query. Arithmetic is exact by
  * construction: quantities are integral (multiplied through to avoid
  * AVG's float division), money goes through DECIMAL(18,6) per Protocol.
  */
object DecorrelationQueries extends QueryModule {

  private def run(s: SparkSession, dir: String, tables: Seq[String], q: String): DataFrame = {
    tables.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(q)
  }

  /** Q17 shape: revenue from "small-quantity" lineitems, where small means
    * below 20% of the part's own average quantity — the avg is multiplied
    * through (5 · qty · cnt < sum) so the correlated comparison is exact
    * integer arithmetic on both engines.
    */
  private val q110 =
    """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_small,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS small_revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      |  AND CAST(l_quantity AS BIGINT) * 5 *
      |      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
      |    < (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Q21 shape: per supplier in a nation band, count 'R'-flagged lines in
    * finished multi-supplier orders where NO other supplier's line is also
    * flagged — EXISTS + NOT EXISTS, both correlated on the order key with a
    * supplier-key inequality.
    */
  private val q111 =
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |  AND s_nationkey = n_nationkey AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  /** Q22 shape: customers with above-average positive balance and no urgent
    * orders (the fixture's order coverage is dense, so bare "no orders"
    * selects nothing) — an uncorrelated scalar aggregate gate (multiplied
    * through for exact decimal comparison) plus a correlated NOT EXISTS
    * anti join with a non-key predicate.
    */
  private val q112 =
    """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS totacctbal
      |FROM customer
      |WHERE CAST(c_acctbal AS DECIMAL(18,6)) *
      |      (SELECT COUNT(*) FROM customer c2 WHERE c2.c_acctbal > 0.0)
      |    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) FROM customer c2 WHERE c2.c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Q13 shape: order-count distribution over a LEFT OUTER join whose
    * non-key join predicate (priority filter) must stay in the join, not
    * slide into a WHERE — the classic outer-join-semantics trap.
    */
  private val q113 =
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c LEFT OUTER JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey) per_cust
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** The hand-optimized 100 TB twin of q110: ONE grouped aggregate computes
    * (count, sum) per part and joins back once, so lineitem is scanned
    * twice, not three times — Spark's MergeScalarSubqueries only merges
    * UNcorrelated twins, so this merge is the query author's job (PLANS.md
    * documents the q110 cost). Same oracle SQL as q110: the gate proves the
    * rewrite is result-identical.
    */
  private def q115(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = Tables.load(s, dir, "lineitem")
    val part = Tables.load(s, dir, "part")
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
    val stats = li.groupBy(col("l_partkey").as("sp_partkey"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("long")).as("qty_sum"))
    li.join(part, li("l_partkey") === part("p_partkey"))
      .join(stats, col("l_partkey") === col("sp_partkey"))
      .filter(col("l_quantity").cast("long") * lit(5L) * col("cnt") < col("qty_sum"))
      .groupBy(col("p_brand"))
      .agg(Protocol.big(count(lit(1))).as("n_small"),
        Protocol.out6(sum(Protocol.dec(col("l_extendedprice")))).as("small_revenue"))
      .orderBy(col("p_brand"))
  }

  /** Q20 shape: suppliers holding an outsized share (>20%) of any single
    * part's total shipped quantity — an IN subquery whose HAVING contains a
    * correlated scalar aggregate over the subquery's own GROUPING column.
    * The deepest decorrelation in the set: Catalyst must rewrite the inner
    * per-part total into its own grouped aggregate joined on l_partkey,
    * evaluate the HAVING against it, and lower the IN into a semi join —
    * three nested rewrites in one query. Integral quantities keep the share
    * comparison exact (multiply-through, no division).
    */
  private val q120 =
    """SELECT s_name, CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l1.l_suppkey FROM lineitem l1
      |  GROUP BY l1.l_suppkey, l1.l_partkey
      |  HAVING SUM(CAST(l1.l_quantity AS BIGINT)) * 5 > (
      |    SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
      |    WHERE l2.l_partkey = l1.l_partkey))
      |ORDER BY s_name""".stripMargin

  override val declared: Seq[Declared] = Seq(
    Declared("q110_corr_scalar_agg",
      (s, dir) => run(s, dir, Seq("lineitem", "part"), q110), Some(q110)),
    Declared("q115_corr_scalar_merged", (s, dir) => q115(s, dir), Some(q110)),
    Declared("q111_double_exists",
      (s, dir) => run(s, dir, Seq("supplier", "lineitem", "orders", "nation"), q111), Some(q111)),
    Declared("q112_avg_gate_anti",
      (s, dir) => run(s, dir, Seq("customer", "orders"), q112), Some(q112)),
    Declared("q113_outer_count_dist",
      (s, dir) => run(s, dir, Seq("customer", "orders"), q113), Some(q113)),
    Declared("q120_nested_having_corr",
      (s, dir) => run(s, dir, Seq("supplier", "lineitem"), q120), Some(q120))
  )
}
