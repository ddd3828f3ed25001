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

  test("batched beam=1 is bit-identical to sequential training (degenerate parity)") {
    // with beam 1 every round's window scan accepts exactly the top pair —
    // the selection rule degenerates to train()'s argmax, so the models
    // must match merge-for-merge including counts, on a corpus that
    // exercises ties, merged-symbol rounds, and overlap runs
    val d = docs((1L, "a b a b c"), (2L, "z a b"), (3L, "x x x x"))
    val seq3 = merges(d, 3)
    val (bat, scans) = BpeTrainer.trainBatched(spark, d, outerRounds = 3, beam = 1)
    assert(bat.map(m => (m.merge_round, m.left, m.right, m.pair_count)) == seq3)
    assert(scans == 3)
  }

  test("the scan-count law: up to R·B merges for R corpus aggregates") {
    // the whole point of the batched variant — sequential train() runs one
    // corpus aggregate PER MERGE; trainBatched runs one per ROUND. Corpus
    // with two symbol-disjoint dominant pairs per round generation:
    // (a,b)×8 and (c,d)×8 dominate round 1, and their merged symbols pair
    // up in round 2.
    val d = docs((0L until 8L).map(i => (i, "a b c d")): _*)
    val (bat, scans) = BpeTrainer.trainBatched(spark, d, outerRounds = 2, beam = 2)
    assert(scans == 2, s"2 rounds must cost exactly 2 corpus aggregates, got $scans")
    assert(bat.map(m => (m.merge_round, m.left, m.right, m.pair_count)) == Seq(
      (1, "a", "b", 8L),   // top count, ties (a,b) < (b,c) < (c,d) lexicographic
      (2, "c", "d", 8L),   // (b,c) rejected: b collides with accepted (a,b)
      (3, "a b", "c d", 8L))) // round 2: the merged symbols pair up; nothing disjoint remains
    // 3 merges, 2 scans — sequential would have cost 3 scans (and a 4th to
    // learn nothing); the law the 32k-merge tokenizer buys
    assert(bat.length > scans)
  }

  test("within-round conflicts reject, not reorder: counts stay round-start-exact") {
    // (a,b) wins round 1; (b,c) — sharing b — must be REJECTED for the
    // round (not deferred-and-recounted), and (c,d), disjoint, accepted
    // with its round-START count even though the (a,b) merge rewrote the
    // corpus before (c,d) applied (disjointness makes the count invariant)
    val d = docs(
      (0L until 6L).map(i => (i, "a b c d")) ++
        Seq((10L, "b c"), (11L, "b c")): _*)
    // counts: (a,b)=6, (b,c)=8, (c,d)=6 — (b,c) wins round 1, and then
    // BOTH (a,b) and (c,d) share a symbol with it: the round accepts only
    // (b,c) even though beam = 2. No deferral, no recount — rejected pairs
    // simply compete again next round against the post-merge corpus.
    val (bat, _) = BpeTrainer.trainBatched(spark, d, outerRounds = 1, beam = 2)
    assert(bat.map(m => (m.left, m.right, m.pair_count)) == Seq(("b", "c", 8L)))
  }

  test("the trio rule: a same-round candidate touching a minted symbol is rejected") {
    // selection must treat the JOINED string of an accepted pair as used in
    // BOTH directions — accepting (a,b) mints symbol "a b", so a candidate
    // whose lhs/rhs IS the string "a b" (a previous round's merge) would
    // match occurrences the (a,b) merge creates MID-round, breaking the
    // round-start count contract and order-independence. Directly pin the
    // pure selection rule (the corpus route can't mint the collision in
    // round 1 because raw tokens never contain spaces).
    val cands = Seq(
      ("a", "b", 100L),   // accept — mints "a b"
      ("a b", "x", 90L),  // REJECT: lhs is the minted symbol
      ("y", "a b", 80L),  // REJECT: rhs is the minted symbol
      ("c", "d", 70L),    // accept
      ("p", "c d", 60L),  // REJECT: rhs is (c,d)'s minted symbol
      ("e", "f", 50L))    // accept
    assert(BpeTrainer.selectDisjoint(cands, beam = 4) == Seq(
      ("a", "b", 100L), ("c", "d", 70L), ("e", "f", 50L)))
    // and the reverse direction: accepted ("a b", x) blocks later (a, b) —
    // whose minted string "a b" collides with an accepted SYMBOL
    val rev = Seq(("a b", "x", 100L), ("a", "b", 90L))
    assert(BpeTrainer.selectDisjoint(rev, beam = 2) == Seq(("a b", "x", 100L)))
  }

  test("batched model is drop-in for encode (learning-order application)") {
    val d = docs((0L until 8L).map(i => (i, "a b c d")): _*)
    val (bat, _) = BpeTrainer.trainBatched(spark, d, outerRounds = 2, beam = 2)
    val got = BpeTrainer.encode(d, bat)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toList
    // merges (a,b), (c,d), then ("a b","c d"): every doc collapses to one symbol
    assert(got == (0L until 8L).map(i => (i, List("a b c d"))).toList)
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
