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

  test("dedup-family plans hold no executor cache (shared stages are written, not persisted)") {
    // The old per-query persist()s leaked cached stages into long-lived
    // sessions; SharedStages materializes to parquet instead. Pin that: the
    // optimized plans of every shared-stage consumer contain no
    // InMemoryRelation (cache) node — race-free against the parallel suite,
    // unlike asserting global storage status on the shared session.
    for (name <- Seq("q32_minhash_pairs", "q34_ngram_jaccard", "q47_dedup_corpus",
        "q57_edit_verify", "q61_decontaminate")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val cached = df.queryExecution.optimizedPlan.collect {
        case im: org.apache.spark.sql.execution.columnar.InMemoryRelation => im
      }
      assert(cached.isEmpty, s"$name plan caches: $cached")
    }
  }

  test("decontamination at the width-13 default: only a full 13-token overlap flags") {
    import spark.implicits._
    val evalDoc = (1 to 20).map(i => s"e$i").mkString(" ") // 20 eval tokens
    // t1 embeds eval tokens 4..16 verbatim (a full 13-gram) -> contaminated;
    // t2 shares only a 12-token run (e4..e15) -> clean at width 13;
    // t3 is disjoint -> clean; t4 is shorter than 13 tokens, degrades to a
    // whole-text shingle that is not itself in the eval set -> clean.
    val t1 = ("x " + (4 to 16).map(i => s"e$i").mkString(" ") + " y z q r s").trim
    val t2 = ("x " + (4 to 15).map(i => s"e$i").mkString(" ") + " y z q r s w").trim
    val t3 = (1 to 20).map(i => s"w$i").mkString(" ")
    val t4 = "e4 e5 e6"
    val train = Seq((1L, t1), (2L, t2), (3L, t3), (4L, t4)).toDF("doc_id", "text")
    val eval_ = Seq(Tuple1(evalDoc)).toDF("text")
    val got = graft.operators.Decontaminate(train, eval_)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L))
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
