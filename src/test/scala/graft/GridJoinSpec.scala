package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GridJoin

/** Pins the grid spatial join's pigeonhole exactness against brute force,
  * including the cases that break naive bucketing: pairs straddling a cell
  * boundary, negative coordinates (floor vs trunc cell alignment), and
  * exact-distance ties.
  */
class GridJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("grid join equals brute force, boundaries and negatives included") {
    import spark.implicits._
    // deterministic scatter around the origin: both signs, duplicates of
    // distance exactly d, cell-boundary straddlers
    val pts = (1L to 200L).map(i => (i, (i * 37 % 41) - 20, (i * 61 % 43) - 21))
      .toDF("id", "x", "y")
    val d = 4L
    val got = GridJoin.chebyshevSelfJoin(pts, "id", "x", "y", d)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ia, xa, ya) <- rows; (ib, xb, yb) <- rows
      if ia < ib && math.abs(xa - xb) <= d && math.abs(ya - yb) <= d
    } yield (ia, ib)).toSet
    assert(got == brute)
    assert(brute.nonEmpty)
    // exactly-at-distance pairs are included (<=, not <)
    assert(brute.exists { case (a, b) =>
      val pa = rows.find(_._1 == a).get; val pb = rows.find(_._1 == b).get
      math.max(math.abs(pa._2 - pb._2), math.abs(pa._3 - pb._3)) == d
    })
  }
}
