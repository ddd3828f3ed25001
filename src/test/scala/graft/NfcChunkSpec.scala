package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Pins for the round-6 additions behind q107/q108: context-window chunking
  * semantics and the codegen'd Unicode NFC expression. All non-ASCII is
  * written as unicode escapes so no editor/encoding pass can pre-compose
  * the decomposed inputs the tests depend on.
  */
class NfcChunkSpec extends AnyFunSuite {
  import TestSpark._

  private def oneStr(c: org.apache.spark.sql.Column, text: String): String = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).collect().head.getString(0)
  }

  test("nfc: composes combining sequences; identity on composed/ASCII; null-safe") {
    import spark.implicits._
    // e + COMBINING ACUTE (U+0301) -> precomposed U+00E9 (2 codepoints -> 1)
    assert(oneStr(nfc(col("text")), "Cafe\u0301") == "Caf\u00e9")
    // A/i + COMBINING DIAERESIS (U+0308) compose too
    assert(oneStr(nfc(col("text")), "A\u0308pfel nai\u0308ve") == "\u00c4pfel na\u00efve")
    // already-NFC and plain ASCII pass through unchanged
    assert(oneStr(nfc(col("text")), "Caf\u00e9") == "Caf\u00e9")
    assert(oneStr(nfc(col("text")), "plain ascii") == "plain ascii")
    // CJK is NFC-stable
    assert(oneStr(nfc(col("text")), "\u4e2d\u6587 ok") == "\u4e2d\u6587 ok")
    // null in -> null out (UnaryExpression default null handling)
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "text")
      .select(nfc(col("text"))).collect().head
    assert(r.isNullAt(0))
    // length drop mirrors what q108 pins at the corpus level: 21 decomposed
    // codepoints -> 18 composed (three combining marks absorbed)
    import org.apache.spark.sql.Row
    val lens = Seq("Cafe\u0301 A\u0308pfel nai\u0308ve x").toDF("text")
      .select(length(col("text")), length(nfc(col("text")))).collect().head
    assert(lens == Row(21, 18))
  }

  test("nfc: interpreted eval matches codegen path") {
    import graft.functions.NfcNormalize
    import org.apache.spark.unsafe.types.UTF8String
    val samples = Seq("Cafe\u0301", "Caf\u00e9", "x", "", "\u00e4\u00f6\u00fc",
      "\ud83c\udf89 e\u0301")
    samples.foreach { t =>
      val interp = NfcNormalize.compute(UTF8String.fromString(t)).toString
      assert(interp == oneStr(nfc(col("text")), t), s"parity for '$t'")
    }
  }

  test("chunking shape: W=50/S=40 windows, trailing no-new-content sliver dropped") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q107_chunk_overlap")(spark, dir).collect()
    val docs = graft.model.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (docId, chunks) =>
      val n = docs(docId)
      // expected starts: multiples of 40 below n, keeping 0 and any start
      // whose truncated window still exceeds the 10-token overlap
      val expected = (0 until n by 40).filter(s => s == 0 || math.min(50, n - s) > 10)
      val got = chunks.sortBy(_.getLong(1))
      assert(got.map(_.getLong(1)).toSeq == expected.indices.map(_.toLong),
        s"doc $docId chunk_idx sequence")
      got.zip(expected).foreach { case (row, s) =>
        assert(row.getLong(2) == math.min(50, n - s), s"doc $docId start $s n_tok")
      }
    }
  }
}
