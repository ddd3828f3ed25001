package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TradeTick
import graft.streaming.Ingest

/** ScalaCheck laws for the reference-semantics transforms (SURVEY §5.4),
  * run through scalacheck's own engine inside scalatest (scalatestplus is
  * not in the offline cache). Spark round-trips are checked over generated
  * batches, not per-sample sessions, to keep runtime sane.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("law: quantity truncation equals BigDecimal floor at 5 dp") {
    // str(q)[:-3] on an 8-dp string == floor to 5 dp for non-negatives
    val gen = Gen.chooseNum(0L, 99999999999L) // up to ~999.99999999
    check("truncate", Prop.forAll(gen) { raw =>
      val q = new java.math.BigDecimal(java.math.BigInteger.valueOf(raw), 8)
      val s = q.toPlainString
      val padded = if (s.contains('.')) s else s + ".00000000"
      val full = padded + "0" * (8 - (padded.length - padded.indexOf('.') - 1))
      val chopped = new java.math.BigDecimal(full.dropRight(3))
      chopped == q.setScale(5, java.math.RoundingMode.FLOOR)
    })
  }

  test("law: window assignment is stable under ms jitter within the minute") {
    val gen = for {
      t <- Gen.chooseNum(0L, 4102444800000L)
      j <- Gen.chooseNum(0L, 59999L)
    } yield (t / 60000 * 60000, j)
    check("window", Prop.forAll(gen) { case (start, jitter) =>
      (start + jitter) / 60000 * 60 == start / 1000
    })
  }

  test("spark law: toBtcusdt time truncation drops sub-second, keeps second") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val ticks = (1 to 300).map { i =>
      val t = math.abs(rnd.nextLong()) % 4102444800000L
      TradeTick(i.toLong, "BTCUSDT", "1.00000000", "0.10000000", t, true)
    }
    val rows = Ingest.toBtcusdt(ticks.toDS().toDF())
      .select(org.apache.spark.sql.functions.unix_seconds(
        org.apache.spark.sql.functions.col("time")).as("sec"),
        org.apache.spark.sql.functions.col("bid"))
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    ticks.foreach(t => assert(rows(t.tradeId) == t.tradeTimeMs / 1000))
  }
}
