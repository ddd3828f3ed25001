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

  test("connected components: giant component through the hot-label broadcast path") {
    import spark.implicits._
    // One giant component (a 10k-node path — worst-case diameter) unioned
    // with a 500-leaf star: the path's min label ends up owning ~10k nodes,
    // far over the test threshold of 64, so pointer doubling MUST route the
    // giant label through the broadcast map while the star stays on the
    // shuffled cold path. Converges within the O(log n) bound (2^15 >> 10k).
    val path = (0L until 9999L).map(i => (i, i + 1L))
    val star = (1L to 500L).map(i => (20000L, 20000L + i))
    val pairs = (path ++ star).toDF("u", "v")
    val got = ConnectedComponents(pairs, maxIters = 16, hotLabelThreshold = 64L)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 10501)
    assert((0L until 10000L).forall(got(_) == 0L))
    assert((20000L to 20500L).forall(got(_) == 20000L))
  }
}
