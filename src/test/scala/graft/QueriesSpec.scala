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
}
