package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer

/** Pins the BPE training loop against hand-computed merges: greedy
  * left-to-right application (overlap runs merge at odd ranks),
  * lexicographic tie-breaks, merged symbols participating in later
  * rounds, and early exhaustion.
  */
class BpeTrainerSpec extends AnyFunSuite {
  import TestSpark._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def merges(d: org.apache.spark.sql.DataFrame, rounds: Int) =
    BpeTrainer.train(spark, d, rounds)
      .map(m => (m.merge_round, m.left, m.right, m.pair_count))

  test("merged symbols join later rounds; ties break lexicographic") {
    // round 1: (a,b) appears three times (twice in doc1, once in doc2) —
    // the clear winner. After merging: doc1 = ["a b","a b","c"],
    // doc2 = ["z","a b"]. Round 2 pairs: ("a b","a b")×1, ("a b","c")×1,
    // ("z","a b")×1 — a three-way tie; lexicographic (l, r) picks
    // ("a b","a b").
    val d = docs((1L, "a b a b c"), (2L, "z a b"))
    assert(merges(d, 2) == Seq(
      (1, "a", "b", 3L),
      (2, "a b", "a b", 1L)))
  }

  test("overlapping run merges greedily left-to-right (odd ranks)") {
    // "x x x x": (x,x) counted 3 times (overlaps included), but the
    // greedy pass merges positions 1 and 3 only -> ["x x","x x"]; round 2
    // then sees exactly one ("x x","x x") pair.
    val d = docs((1L, "x x x x"))
    assert(merges(d, 2) == Seq(
      (1, "x", "x", 3L),
      (2, "x x", "x x", 1L)))
  }

  test("exhaustion stops early: single-symbol docs have no pairs") {
    val d = docs((1L, "a b"), (2L, "solo"))
    // round 1 merges the only pair; round 2 finds none and stops
    assert(merges(d, 5) == Seq((1, "a", "b", 1L)))
  }

  test("encode with the trained model reproduces training's final state") {
    // q261's core law: encode(corpus, train(corpus, R)) applies the same
    // greedy pass in learning order, so it must land exactly where the
    // training loop ended. Hand case: merges are (a,b) then ("a b","a b");
    // doc1 "a b a b c" -> ["a b a b","c"], doc2 "z a b" -> ["z","a b"].
    val d = docs((1L, "a b a b c"), (2L, "z a b"))
    val model = BpeTrainer.train(spark, d, 2)
    val got = BpeTrainer.encode(d, model)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toList
    assert(got == List(
      (1L, List("a b a b", "c")),
      (2L, List("z", "a b"))))
  }

  test("encode is one shuffle-free projection (the scale claim)") {
    // The encoder is R nested in-row folds in a single Project — no joins,
    // no aggregates, no exchange. A regression that sneaks a shuffle into
    // the apply path (e.g. joining the model instead of inlining it) turns
    // the embarrassingly-parallel pass into a cluster-wide reshuffle.
    val d = docs((1L, "a b a b c"), (2L, "z a b"))
    val model = BpeTrainer.train(spark, d, 2)
    val plan = BpeTrainer.encode(d, model).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must be shuffle-free:\n$plan")
  }

  test("data-derived symbols with backslashes and quotes survive the expr round-trip") {
    // The merge is applied through string-interpolated SQL literals, and
    // Spark's parser processes backslash escapes inside literals — a
    // learned symbol like `\n` (two characters) must match itself, not an
    // escape sequence. Corpus: the pair (\n, it's) dominates; training
    // must learn it and encode must merge exactly those occurrences.
    val d = docs((1L, """\n it's \n it's q"""), (2L, """p \n it's"""))
    val model = BpeTrainer.train(spark, d, 1)
    assert(model.map(m => (m.left, m.right, m.pair_count)) ==
      Seq(("""\n""", "it's", 3L)))
    val got = BpeTrainer.encode(d, model)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toList
    assert(got == List(
      (1L, List("""\n it's""", """\n it's""", "q")),
      (2L, List("p", """\n it's"""))))
  }

  test("the fold cannot chain-merge within one round") {
    // merge (a,b) over "a a b b": pairs (a,a),(a,b),(b,b) all count 1;
    // lexicographic winner is (a,a). Next round on ["a a","b","b"]:
    // winner ("a a","b")? pairs: ("a a",b)x1, (b,b)x1 -> ("a a","b") wins
    // lexicographically. The fresh "a a b" symbol must NOT re-merge with
    // the trailing b in the same pass (it is not equal to the left part).
    val d = docs((1L, "a a b b"))
    assert(merges(d, 3) == Seq(
      (1, "a", "a", 1L),
      (2, "a a", "b", 1L),
      (3, "a a b", "b", 1L)))
  }
}
