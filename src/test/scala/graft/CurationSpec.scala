package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** Unit semantics for the corpus-curation operators; the fixture-scale
  * cross-check runs in tools/check.py (q60-q65).
  */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  test("connected components: chains collapse transitively, singletons absent") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, 99 isolated (no edge -> no row)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("u", "v")
    val got = ConnectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: deep chain converges within the pointer-doubling bound") {
    import spark.implicits._
    // a 40-node path: diameter 39, but pointer doubling needs ~log2 rounds
    val pairs = (0L until 39L).map(i => (i + 1L, i)).toDF("u", "v")
    val got = ConnectedComponents(pairs, maxIters = 10).as[(Long, Long)].collect().toMap
    assert(got.size == 40 && got.values.forall(_ == 0L))
  }

  test("connected components: edge direction and duplicates don't matter") {
    import spark.implicits._
    val pairs = Seq((5L, 2L), (2L, 5L), (5L, 2L), (7L, 5L)).toDF("u", "v")
    val got = ConnectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 2L, 5L -> 2L, 7L -> 2L))
  }
}
