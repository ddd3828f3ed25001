package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

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
  test("spark law: PageRank equals a driver-side exact simulation on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      val n = 5 + rnd.nextInt(8)
      val edges = (for {
        s <- 0 until n; d <- 0 until n
        if s != d && rnd.nextInt(3) == 0
      } yield (s.toLong, d.toLong, 1L + rnd.nextInt(9).toLong))
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst", "w")
        val got = graft.operators.PageRank.run(df, iters = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // exact reference: same floor-then-sum recurrence, plain Scala
        val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
        val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
        val nn = nodes.size.toLong
        var pr = nodes.map(v => v -> 1000000L / nn).toMap
        (1 to 3).foreach { _ =>
          val contrib = edges.groupBy(_._2).view.mapValues(
            _.map { case (s, _, w) => 17L * pr(s) * w / (20L * outw(s)) }.sum).toMap
          pr = nodes.map(v => v -> (150000L / nn + contrib.getOrElse(v, 0L))).toMap
        }
        assert(got == pr, s"trial $trial: spark=$got ref=$pr")
      }
    }
  }

  test("spark law: capped sessions match a per-user brute-force replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // adversarial micro-times: dense bursts around the 30-min and 2-h edges
    val rows = (for {
      u <- 0 until 8
      i <- 0 until 40
    } yield {
      val stepUs = rnd.nextInt(4) match {
        case 0 => rnd.nextInt(1000)                    // sub-ms burst
        case 1 => 1800000000L + rnd.nextInt(3) - 1     // at the gap edge
        case 2 => rnd.nextInt(1200) * 1000000L         // inside the session
        case _ => 7200000000L + rnd.nextInt(3) - 1     // at the cap edge
      }
      (u.toLong, i.toLong, stepUs)
    }).groupBy(_._1).toSeq.flatMap { case (u, steps) =>
      var t = 1700000000000000L
      steps.sortBy(_._2).map { case (_, i, d) => t += d; (u, i, t) }
    }
    val df = rows.toDF("user_id", "event_id", "us")
      .select(col("user_id"), col("event_id"),
        expr("timestamp_micros(us)").as("ts"), col("us"))
    df.createOrReplaceTempView("prop_events")
    // run the q137 logic inline over the synthetic frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val lagUs = lag(col("us"), 1).over(w)
    val sess = df
      .withColumn("brk", when(lagUs.isNull || col("us") - lagUs > 1800000000L, 1L).otherwise(0L))
      .withColumn("gs", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    val wS = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"), col("gs"))
    val got = sess
      .withColumn("sub", graft.functions.ColumnOps.idiv(
        col("us") - min(col("us")).over(wS), lit(7200000000L)))
      .groupBy(col("user_id"), col("gs"), col("sub"))
      .agg(min(col("us")).as("start_us"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    // brute force: walk each user's sorted events, split on gap>30min from
    // the PREVIOUS event or lane change from the gap-session start
    val ref = rows.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      var out = List.empty[(Long, Long, Long)] // (user, start, n)
      var gapStart = -1L; var prev = -1L; var lane = -1L
      var curStart = -1L; var curN = 0L
      sorted.foreach { case (_, _, t) =>
        val newGap = prev < 0 || t - prev > 1800000000L
        val newLane = if (newGap) 0L else (t - gapStart) / 7200000000L
        if (newGap || newLane != lane) {
          if (curN > 0) out ::= ((u, curStart, curN))
          curStart = t; curN = 0
          if (newGap) gapStart = t
          lane = newLane
        }
        curN += 1; prev = t
      }
      if (curN > 0) out ::= ((u, curStart, curN))
      out
    }.toSet
    assert(got == ref, s"mismatch:\n got=${got.toList.sorted.take(10)}\n ref=${ref.toList.sorted.take(10)}")
  }
  test("spark law: BoundedTopK equals sort-take on adversarial duplicates, any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    // few distinct scores -> dense ties; tie-break must carry the result
    val rows = (1 to 400).map(i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(5).toDouble, rnd.nextInt(50).toLong, i.toLong))
    val df = rows.toDF("g", "p", "a", "b").repartition(13)
    val top3 = udaf(new graft.functions.Udafs.BoundedTopK(3),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    val got = df.groupBy(col("g")).agg(top3(col("p"), col("a"), col("b")).as("t"))
      .select(col("g"), col("t.score"), col("t.k1"), col("t.k2"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](1), r.getSeq[Long](2), r.getSeq[Long](3))).toMap
    val ref = rows.groupBy(_._1).view.mapValues { g =>
      val s = g.map(t => (t._2, t._3, t._4)).sortBy(t => (-t._1, t._2, t._3)).take(3)
      (s.map(_._1), s.map(_._2), s.map(_._3))
    }.toMap
    ref.foreach { case (g, (ps, as_, bs)) =>
      val (gp, ga, gb) = got(g)
      assert(gp == ps && ga == as_ && gb == bs,
        s"group $g: got ($gp,$ga,$gb) want ($ps,$as_,$bs)")
    }
  }
}
