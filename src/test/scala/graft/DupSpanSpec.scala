package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DupSpans

/** Pins the duplicated-span operator (q262) on hand-checkable corpora:
  * maximal-run coalescing, within-document repeats, the edit-splits-span
  * law (exactness), the short-document scope rule, and the plan shape
  * (hash equi-join on the gram hash — never a cross join).
  */
class DupSpanSpec extends AnyFunSuite {
  import TestSpark._

  private def spans(width: Int, rows: (Long, String)*) = {
    import spark.implicits._
    DupSpans.spans(rows.toDF("doc_id", "text"), width)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("a shared 4-token span at width 3 coalesces to one maximal span per doc") {
    // d1 and d2 share "p q r s" (4 tokens); its two 3-grams are each
    // duplicated, their positions are consecutive, and the islands pass
    // must report ONE span covering all 4 tokens in each document.
    val got = spans(3, 1L -> "p q r s t", 2L -> "x p q r s y")
    assert(got == Seq((1L, 1L, 4L, 4L), (2L, 2L, 5L, 4L)))
  }

  test("a repeat WITHIN one document is found (two separate spans)") {
    // "a a a" occurs at positions 1 and 6 of the same doc — non-adjacent,
    // so two maximal spans, no cross-document partner needed.
    val got = spans(3, 1L -> "a a a b c a a a")
    assert(got == Seq((1L, 1L, 3L, 3L), (1L, 6L, 8L, 3L)))
  }

  test("a 1-token edit SPLITS a long duplicated span — both halves still found") {
    // d4/d5 differ only at token 4; the shared prefix and suffix are each
    // reported, the edit position itself is in neither. This is the
    // exactness law MinHash cannot give: partial overlap is localized.
    val got = spans(3, 4L -> "m n o p q r s", 5L -> "m n o X q r s")
    assert(got == Seq(
      (4L, 1L, 3L, 3L), (4L, 5L, 7L, 3L),
      (5L, 1L, 3L, 3L), (5L, 5L, 7L, 3L)))
  }

  test("documents shorter than the width are out of scope; unique docs emit nothing") {
    val got = spans(3, 1L -> "u v", 2L -> "totally unique words here", 3L -> "u v")
    // doc 1 and 3 are identical but only 2 tokens long — below width 3 no
    // W-gram exists, so by the span-width definition nothing is reported.
    assert(got.isEmpty)
  }

  test("scrub rewrite: later copy loses the span, kept tokens preserve order") {
    import spark.implicits._
    // doc 1 owns the first occurrence of the shared 3-token span; doc 2's
    // copy is cut, leaving its unique frame tokens in original order. A
    // FULLY duplicated doc scrubs to the empty string (md5(""), the
    // cross-engine constant — DuckDB's array_to_string(empty) is NULL, so
    // the oracle COALESCEs; this test pins the Spark side of that law).
    val d = Seq(1L -> "p q r", 2L -> "x p q r y", 3L -> "p q r")
      .toDF("doc_id", "text")
    val got = graft.operators.DupSpans.scrubbedText(d, 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.empty[Byte]).map("%02x".format(_)).mkString
    val frameMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("x y".getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1 untouched (first occurrence) -> absent; doc 2 keeps "x y";
    // doc 3 (exact later copy) scrubs to empty
    assert(got == List((2L, 2L, frameMd5), (3L, 0L, emptyMd5)))
  }

  test("randomized law: spans equal the brute-force reference on 30 corpora") {
    import spark.implicits._
    // Scala-side reference: duplicated W-windows by exact string equality,
    // runs coalesced per doc — independent logic, no md5, no SQL.
    def reference(docs: Seq[(Long, String)], w: Int): Set[(Long, Long, Long, Long)] = {
      val grams = docs.flatMap { case (id, text) =>
        val tk = text.split(" ")
        if (tk.length < w) Seq.empty
        else (0 to tk.length - w).map(i => (id, i + 1, tk.slice(i, i + w).mkString(" ")))
      }
      val dup = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
      grams.filter(g => dup(g._3)).groupBy(_._1).flatMap { case (id, hs) =>
        val ps = hs.map(_._2).sorted
        // coalesce consecutive start positions into maximal runs
        ps.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
          case (acc, p) => (p, p) :: acc
        }.map { case (s, e) => (id, s.toLong, (e + w - 1).toLong, (e + w - s).toLong) }
      }.toSet
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 30) {
      // small vocab + short docs force dup-rich corpora with overlap runs
      val vocab = Vector("a", "b", "c", "d")
      val docs = (1L to (3 + rnd.nextInt(5)).toLong).map { id =>
        id -> Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = DupSpans.spans(docs.toDF("doc_id", "text"), 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == reference(docs, 3), s"trial $trial diverged on corpus: $docs")
    }
  }

  test("keep-first stays correct past 2^20-token documents (struct order key)") {
    import spark.implicits._
    // doc 0 carries the duplicated 3-gram at a position BEYOND 2^20; doc 1
    // carries it at pos 1. True keep-first order: doc 0 (smaller doc_id)
    // is first, doc 1 is the redundant copy. The retired packed-BIGINT key
    // (doc_id*2^20 + pos) aliased here — 0*2^20 + (2^20+pad+1) for doc 0
    // vs 1*2^20 + 1 for doc 1 — and silently flagged doc 0 instead; the
    // struct MIN has no such bound.
    val pad = 1048590 // > 2^20 filler tokens ahead of the duplicated gram
    val big = (1 to pad).map("u" + _).mkString(" ") + " dup1 dup2 dup3"
    val out = DupSpans.scrubCounts(
        Seq(0L -> big, 1L -> "dup1 dup2 dup3").toDF("doc_id", "text"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out == Map(1L -> 3L),
      s"the LATER copy (doc 1) must lose the span, got $out")
  }

  test("plan shape: gram-hash equi-join, no cross join, doc-partitioned window") {
    import spark.implicits._
    val df = DupSpans.spans(
      Seq(1L -> "p q r s t", 2L -> "x p q r s y").toDF("doc_id", "text"), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "duplicated-gram join must be an equi-join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "duplicated-gram join must be an equi-join")
  }
}
