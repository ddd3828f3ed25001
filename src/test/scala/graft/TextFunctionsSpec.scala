package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).collect().head.get(0).asInstanceOf[T]
  }

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).collect().head
      .getSeq[String](0).toSeq
  }

  test("shingles: 3-gram windows; short docs degrade to whole text") {
    assert(oneSeq(shingles3(col("text")), "a b c d") == Seq("a b c", "b c d"))
    assert(oneSeq(shingles3(col("text")), "a b") == Seq("a b"))
  }

  test("shingles: codegen expression matches the HOF reference formulation") {
    import spark.implicits._
    val texts = Seq(
      "a b c d e", "a b", "x", "", "a  b c d", // double space keeps empty token
      "tok1 tok2 tok1 tok2 tok1 tok2",          // duplicate shingles
      "é ü 中文 🎉 plain txt")                   // non-ASCII survives byte round-trip
    texts.foreach { t =>
      assert(oneSeq(shingles3(col("text")), t) ==
        oneSeq(shingles3Hof(col("text")), t), s"all-shingles parity for '$t'")
      assert(oneSeq(shingles3Distinct(col("text")), t) ==
        oneSeq(array_distinct(shingles3Hof(col("text"))), t), s"distinct parity for '$t'")
    }
    // SQL registry path
    val viaSql = Seq("a b c d").toDF("text")
      .selectExpr("shingle_array(text, true) AS sh").collect().head.getSeq[String](0)
    assert(viaSql == Seq("a b c", "b c d"))
  }

  test("shingles: width-n generalization matches a reference sliding window") {
    def ref(text: String, n: Int): Seq[String] = {
      val toks = text.split(" ", -1)
      if (toks.length < n) Seq(text)
      else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
    }
    val texts = Seq("a b c d e f g", "a b", "", "t t t t t", "é ü 中文 x y")
    for (t <- texts; n <- Seq(1, 2, 3, 5, 13)) {
      assert(oneSeq(shinglesDistinct(col("text"), n), t) == ref(t, n),
        s"width-$n parity for '$t'")
    }
  }

  test("minhash: identical docs share full signature; permuted docs mostly overlap") {
    import spark.implicits._
    val df = Seq(
      (1, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3, "zz yy xx ww vv uu tt ss")).toDF("id", "text")
      .select(col("id"), minhashSig(array_distinct(shingles3(col("text"))), 16).as("sig"))
    val sigs = df.collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(sigs(1) == sigs(2))
    assert(sigs(1) != sigs(3))
    // deterministic across evaluations
    val again = Seq((1, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("id", "text")
      .select(minhashSig(array_distinct(shingles3(col("text"))), 16)).collect().head.getSeq[String](0)
    assert(again == sigs(1))
  }

  test("simhash: equal token sets equal fingerprints; order-insensitive; 32-bit") {
    val a = one[Long](simhash32("text"), "alpha beta gamma delta")
    val b = one[Long](simhash32("text"), "delta gamma beta alpha")
    val c = one[Long](simhash32("text"), "completely different words here")
    assert(a == b)      // distinct-token construction is order-free
    assert(a != c)
    assert(a >= 0 && a < (1L << 32))
  }

  test("rolling fingerprint: order-SENSITIVE, bounded by modulus") {
    val a = one[Long](rollingFingerprint("text"), "alpha beta gamma")
    val b = one[Long](rollingFingerprint("text"), "gamma beta alpha")
    assert(a != b)
    assert(a >= 0 && a < 1000000007L)
  }

  test("explode_shingles UDTF: Generate rows via SQL and lateral view") {
    import spark.implicits._
    // no manual registration: the extension-injected function (GraftExtensions
    // on the shared test session) must serve the SQL path
    Seq((1L, "a b c d"), (2L, "x y")).toDF("id", "text").createOrReplaceTempView("docs")
    val rows = spark.sql(
      "SELECT id, s.pos, s.shingle FROM docs LATERAL VIEW explode_shingles(text, 3) s ORDER BY id, pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toList
    assert(rows == List((1L, 0, "a b c"), (1L, 1, "b c d"), (2L, 0, "x y")))
  }

  test("hamming64") {
    import spark.implicits._
    val d = Seq((0L, 0L), (0L, 7L), (Long.MaxValue, 0L))
      .toDF("a", "b").select(hamming64(col("a"), col("b"))).as[Long].collect()
    assert(d.toSeq == Seq(0L, 3L, 63L))
  }

  test("jaro_winkler: textbook values, boost threshold, empties, code points") {
    import spark.implicits._
    val cases = Seq(
      ("MARTHA", "MARHTA"),       // classic: 2 transposed chars
      ("DIXON", "DICKSONX"),
      ("abcdef", "abczzz"),       // jaro 2/3 <= 0.7: NO prefix boost
      ("ab", "abcdefghij"),       // jaro > 0.7: prefix boost applies
      ("", ""), ("", "abc"),      // DuckDB: empty side -> 0, even both
      ("same", "same"),
      ("a😀b", "a😀b"), // supplementary plane: 3 code points, equal
      ("😀x", "x😀"))   // 2 code points swapped, window 0 -> no match
    val got = cases.toDF("a", "b")
      .select(graft.functions.TextFunctions.jaroWinkler(col("a"), col("b")))
      .as[Double].collect()
    val want = Seq(0.9611111111111111, 0.8133333333333332, 2.0 / 3,
      0.7866666666666667, 0.0, 0.0, 1.0, 1.0, 0.0)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) < 1e-12, s"case $i: got $g want $w")
    }
    // SQL registration through GraftExtensions
    val viaSql = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA')")
      .as[Double].head()
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-12)
  }

  test("property: window bucket id = floor(T/60000) for any epoch-ms") {
    import graft.streaming.Ingest
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val samples = (Seq(0L, 59999L, 60000L, 4102444800000L) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) % 4102444800000L))
    val got = samples.toDF("tradeTimeMs")
      .select(col("tradeTimeMs"), Ingest.windowStartSec(col("tradeTimeMs")).as("w"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(0) / 60000 * 60))
  }

  test("property: TSV round-trip is identity on the tick schema") {
    import graft.model.{Tables, TradeTick}
    import graft.streaming.Ingest
    import spark.implicits._
    val ticks = (1 to 50).map { i =>
      TradeTick(i.toLong, "BTCUSDT", f"${i * 1.37}%.8f", f"${i * 0.00013}%.8f",
        1700000000000L + i * 777L, i % 2 == 0)
    }
    val rows = Ingest.toBtcusdt(ticks.toDF())
      .withColumn("time", date_format(col("time"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("maker", when(col("maker"), 1).otherwise(0))
    val dir = tmpDir("tsv-rt")
    rows.write.option("sep", "\t").option("header", "false").mode("overwrite").csv(dir)
    val back = spark.read.schema(Tables.btcusdtTsvSchema)
      .option("sep", "\t").option("header", "false").csv(dir)
    val orig = Ingest.toBtcusdt(ticks.toDF())
      .withColumn("maker", when(col("maker"), 1).otherwise(0).cast("byte"))
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0)
  }
}
