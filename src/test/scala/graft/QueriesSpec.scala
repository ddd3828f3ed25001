package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of every declared query at sf0.001 — fast smoke
  * that each builder runs, plus cross-query consistency laws. The
  * value-exact gate is the DuckDB oracle (tools/check.py / driver t2).
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val results: Map[String, Long] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf0001).count()
    }

  test("every declared query runs at sf0.001") {
    assert(results.size == SparkEntry.queries.size)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("semi + anti partition the customer table (Q08/Q09 vs Q07)") {
    assert(results("q08_semi_join") + results("q09_anti_join") == 150L)
    assert(results("q07_left_join") == 150L)
  }

  test("rollup/cube/grouping-sets cardinalities are consistent (Q18/Q19)") {
    // rollup(a,b): groups + a-subtotals + grand total
    val q18 = results("q18_rollup")
    val q02 = results("q02_agg") // base (a,b) groups
    assert(q18 > q02)
    // cube adds the b-subtotal slice on top of rollup
    assert(results("q19_cube") >= q18)
    assert(results("q19_grouping_sets") < results("q19_cube"))
  }

  test("top-k caps (Q03/Q16/Q26/Q27)") {
    assert(results("q03_topk") == 10L)
    assert(results("q16_window_rank") == 15L) // 5 segments x 3
    assert(results("q26_vector_topk") == 5L)
    assert(results("q27_ann_topk") == 60L)    // 20 queries x 3
  }

  test("sessionization covers every user exactly once (Q23)") {
    assert(results("q23_sessionize") ==
      graft.model.Tables.load(spark, sf0001, "events")
        .select("user_id").distinct().count())
  }

  test("HLL estimates land within a tight bound of exact (q39)") {
    // The gate pins the ±10% envelope booleans; this pins the estimates
    // themselves to ±5% (rsd=0.02 ⇒ ~2.5σ) so a silently-degraded sketch
    // cannot hide behind the looser oracle bound.
    import org.apache.spark.sql.functions._
    val r = graft.model.Tables.load(spark, sf0001, "lineitem")
      .agg(
        countDistinct(col("l_partkey")).as("ep"),
        countDistinct(col("l_suppkey")).as("es"),
        approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("as"))
      .collect().head
    val (ep, es, ap, as) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(math.abs(ap - ep).toDouble / ep <= 0.05, s"parts: est $ap vs exact $ep")
    assert(math.abs(as - es).toDouble / es <= 0.05, s"supps: est $as vs exact $es")
  }

  test("ANN fixture configs are provably exhaustive vs brute force (q40/q46)") {
    // q40 (16 one-bit bands) and q46 (nprobe = all 8 lists) must equal the
    // exact brute-force top-3 (q27 restricted to the same output columns).
    import org.apache.spark.sql.functions._
    val brute = SparkEntry.queries("q27_ann_topk")(spark, sf0001)
      .select("qid", "rn", "vec_id").collect().toSeq
    for (q <- Seq("q40_ann_lsh", "q46_ann_ivf")) {
      val got = SparkEntry.queries(q)(spark, sf0001)
        .select("qid", "rn", "vec_id").collect().toSeq
      assert(got == brute, s"$q diverges from brute-force top-3")
    }
  }

  test("entry flagship returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("outer join covers both sides at sf0.001 (q42)") {
    // 10 suppliers over 25 nations: full outer must emit all 25 nations
    assert(results("q42_outer_joins") == 25L)
  }

  test("sliding windows give 10x multiplicity (q45)") {
    import org.apache.spark.sql.functions._
    val total = SparkEntry.queries("q45_sliding_window")(spark, sf0001)
      .agg(sum("n")).collect().head.getLong(0)
    val events = graft.model.Tables.load(spark, sf0001, "events").count()
    assert(total == events * 10)
  }

  test("exact-moment statistics agree with the builtin double aggregates (q79)") {
    import org.apache.spark.sql.functions._
    // q79 re-derives corr/covar_pop/stddev_pop from exact decimal moments
    // (merge-order-independent); the builtins compute the same statistics
    // in one-pass doubles. Agreement within float slack proves the closed
    // forms are the right formulas, independent of the DuckDB oracle.
    val li = graft.model.Tables.load(spark, sf0001, "lineitem")
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_pop(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_pop(col("l_quantity")).as("sq"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = SparkEntry.queries("q79_exact_moments")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(exact.keySet == builtin.keySet)
    exact.foreach { case (k, (c, cv, sq)) =>
      val (bc, bcv, bsq) = builtin(k)
      assert(math.abs(c - bc) < 1e-6, s"corr $k: $c vs $bc")
      assert(math.abs(cv - bcv) / math.abs(bcv).max(1.0) < 1e-6, s"covar $k")
      assert(math.abs(sq - bsq) / bsq.max(1.0) < 1e-6, s"stddev $k")
    }
  }
}
