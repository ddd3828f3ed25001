package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the TPC-H sweep (q121-q133): the sweep's value is that the
  * STOCK optimizer produces the scale-right plan for every canonical shape
  * — these pins assert the load-bearing choices (results are owned by the
  * oracle gate, which runs the same SQL text on DuckDB).
  */
class TpchSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def phys(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("Q3: LIMIT-with-sort plans as TakeOrderedAndProject, never a global sort") {
    val p = phys("q121_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$p")
    assert(!p.contains("Sort ["), s"unexpected full sort for a LIMIT query:\n$p")
  }

  test("Q4: correlated EXISTS lowers to a semi join with the date filter pushed") {
    val p = phys("q122_tpch_q4")
    assert(p.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$p")
    assert(p.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("o_orderdate")),
      s"date filter not pushed to the orders scan:\n$p")
  }

  test("Q5: the nation/region dims broadcast at default thresholds") {
    val p = phys("q123_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast in the star join:\n$p")
  }

  test("Q16: NOT IN plans as a null-aware anti join") {
    val p = phys("q131_tpch_q16")
    assert(p.contains("LeftAnti"), s"NOT IN did not become an anti join:\n$p")
  }

  test("Q18: IN over grouped HAVING lowers to a semi join on the aggregate") {
    val p = phys("q132_tpch_q18")
    assert(p.contains("LeftSemi"), s"IN did not become a semi join:\n$p")
    assert(p.linesIterator.exists(l =>
        l.contains("HashAggregate") && l.contains("l_orderkey")),
      s"expected the per-order quantity aggregate:\n$p")
  }
}
