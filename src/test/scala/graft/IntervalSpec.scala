package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the q200-q204 interval/sequence family, independent of
  * the DuckDB oracle gate: the Lindley closed form vs a literal sequential
  * fold, merge/abut/gap boundary rules, streak tie-breaks, the exact-budget
  * apportionment law, and midnight splitting.
  */
class IntervalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  /** Mini events table in the fixture column order; et picks the delta sign
    * (purchase/signup credit, click/view/error debit — IntervalQueries.tape).
    */
  private def writeEvents(dir: String, rows: Seq[(Long, Long, Long, String, Double)]): Unit =
    rows.map { case (id, sec, uid, et, v) => (id, ts(sec), uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q200 clamped balance: hand-computed Lindley tape with two floor hits") {
    val dir = tmpDir("ivl200")
    // deltas +10 -4 -8 +5 -2 -4 +7 -> B: 10 6 0 5 3 0 7 (clamps at rows 3, 6)
    writeEvents(dir, Seq(
      (1L, 1L, 0L, "signup", 10.0), (2L, 2L, 0L, "click", 4.0),
      (3L, 3L, 0L, "view", 8.0), (4L, 4L, 0L, "purchase", 5.0),
      (5L, 5L, 0L, "error", 2.0), (6L, 6L, 0L, "click", 4.0),
      (7L, 7L, 0L, "purchase", 7.0)))
    val r = SparkEntry.queries("q200_clamped_balance")(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("final_micro") == 7000000L)
    assert(r.head.getAs[Long]("peak_micro") == 10000000L)
    assert(r.head.getAs[Long]("n_floor") == 2L)
  }

  test("q200 window formulation == literal sequential fold (seeded multi-user tape)") {
    val dir = tmpDir("ivl200f")
    val rnd = new scala.util.Random(42)
    val types = Vector("signup", "purchase", "click", "view", "error")
    val rows = (0 until 600).map { i =>
      (i.toLong, (rnd.nextInt(100000) + 1).toLong, (i % 3).toLong,
        types(rnd.nextInt(5)), (rnd.nextInt(50000) + 1) / 100.0)
    }
    writeEvents(dir, rows)
    // literal fold: B := max(0, B + delta), tracking peak and floor hits
    val expected = rows
      .map { case (id, sec, uid, et, v) =>
        val sign = if (et == "signup" || et == "purchase") 1L else -1L
        (uid, sec, id, sign * math.round(v * 1e6))
      }
      .groupBy(_._1)
      .map { case (uid, evs) =>
        var b, peak = 0L; var nFloor = 0L
        evs.sortBy(e => (e._2, e._3)).foreach { e =>
          b = math.max(0L, b + e._4)
          peak = math.max(peak, b)
          if (b == 0L) nFloor += 1
        }
        uid -> ((b, peak, nFloor))
      }
    val got = SparkEntry.queries("q200_clamped_balance")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("final_micro"), r.getAs[Long]("peak_micro"),
          r.getAs[Long]("n_floor")))).toMap
    assert(got == expected)
  }

  test("q201 interval union: abutting windows merge, gaps split") {
    val dir = tmpDir("ivl201")
    // H = 30 min. Events at 0s and 1800s abut exactly (s == prev end) ->
    // ONE island [0, 3600s); event at 7200s is a second island [7200, 9000).
    writeEvents(dir, Seq(
      (1L, 0L, 0L, "view", 1.0), (2L, 1800L, 0L, "view", 1.0),
      (3L, 7200L, 0L, "view", 1.0)))
    val r = SparkEntry.queries("q201_interval_union")(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_islands") == 2L)
    assert(r.head.getAs[Long]("covered_us") == (3600L + 1800L) * 1000000L)
    assert(r.head.getAs[Long]("longest_us") == 3600L * 1000000L)
  }

  test("q202 longest streak: consecutive-day islands, earliest start wins ties") {
    val dir = tmpDir("ivl202")
    val day = 86400L
    // user 0: days 1,2,3 then 5,6 -> streak 3 starting day 1
    // user 1: days 1,2 and 5,6 (both len 2) -> tie, earliest start (1) wins
    writeEvents(dir,
      Seq(1L, 2L, 3L, 5L, 6L).zipWithIndex.map { case (d, i) =>
        ((i + 1).toLong, d * day + 10L, 0L, "view", 1.0)
      } ++
      Seq(1L, 2L, 5L, 6L).zipWithIndex.map { case (d, i) =>
        ((i + 10).toLong, d * day + 10L, 1L, "view", 1.0)
      })
    val r = SparkEntry.queries("q202_longest_streak")(spark, dir).collect()
      .map(x => x.getAs[Long]("user_id") ->
        ((x.getAs[Long]("streak"), x.getAs[Long]("start_d")))).toMap
    assert(r(0L) == ((3L, 1L)))
    assert(r(1L) == ((2L, 1L)))
  }

  private def writeDocs(dir: String, rows: Seq[(Long, String, Long)]): Unit =
    rows.map { case (id, src, nc) => (id, "t", "en", src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("q203 apportionment: exact quotas allocate exactly; remainder tie -> lexicographic") {
    val dir = tmpDir("ivl203a")
    // chars 5/3/2 of 10: quotas are exact -> base == alloc, zero leftover
    writeDocs(dir, Seq((1L, "a", 5L), (2L, "b", 3L), (3L, "c", 2L)))
    val r = SparkEntry.queries("q203_apportion_budget")(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("alloc")).toMap
    assert(r == Map("a" -> 500000L, "b" -> 300000L, "c" -> 200000L))

    val dir2 = tmpDir("ivl203b")
    // three equal sources, N=10^6: base 333333 each, leftover 1, remainders
    // all equal -> lexicographically first source gets the extra unit
    writeDocs(dir2, Seq((1L, "x", 7L), (2L, "m", 7L), (3L, "a", 7L)))
    val r2 = SparkEntry.queries("q203_apportion_budget")(spark, dir2).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("alloc")).toMap
    assert(r2 == Map("a" -> 333334L, "m" -> 333333L, "x" -> 333333L))
  }

  test("q203 law on the fixture corpus: sum(alloc) == 1e6, alloc - base in {0,1}") {
    val rows = SparkEntry.queries("q203_apportion_budget")(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == 1000000L)
    assert(rows.forall { r =>
      val d = r.getAs[Long]("alloc") - r.getAs[Long]("base"); d == 0L || d == 1L
    })
  }

  test("q204 day split: a session crossing midnight bills each day its exact overlap") {
    val dir = tmpDir("ivl204")
    val day = 86400L
    // single event at 23:45 day 0 -> island [23:45, 00:15 next day):
    // day 0 gets 900 s, day 1 gets 900 s
    writeEvents(dir, Seq((1L, day - 900L, 0L, "view", 1.0)))
    val r = SparkEntry.queries("q204_daily_utilization")(spark, dir).collect()
      .map(x => x.getAs[Long]("d") -> x.getAs[Long]("active_us")).toMap
    assert(r == Map(0L -> 900L * 1000000L, 1L -> 900L * 1000000L))
  }

  test("q206 rendezvous: minimal remap — dropping a shard moves ONLY its keys") {
    import graft.operators.Rendezvous
    val docs = graft.model.Tables.load(spark, sf0001, "documents").select("doc_id")
    val full = Rendezvous.assign(docs, org.apache.spark.sql.functions.col("doc_id"),
        0 until 16).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("shard")).toMap
    val without7 = Rendezvous.assign(docs, org.apache.spark.sql.functions.col("doc_id"),
        (0 until 16).filterNot(_ == 7)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("shard")).toMap
    full.foreach { case (id, sh) =>
      if (sh == 7) assert(without7(id) != 7, s"doc $id still on removed shard")
      else assert(without7(id) == sh,
        s"doc $id moved $sh -> ${without7(id)} though shard 7's removal shouldn't touch it")
    }
    // balance: every shard non-empty, none above 3x the uniform share
    val sizes = full.values.groupBy(identity).map(_._2.size)
    assert(sizes.size == 16 && sizes.forall(_ <= 3 * full.size / 16), s"skewed: $sizes")
  }

  test("rendezvous: NUL-prefixed key raises instead of colliding with the NULL sentinel") {
    import spark.implicits._
    import graft.operators.Rendezvous
    import org.apache.spark.sql.functions.col
    // NULL keys are fine (the sentinel path) ...
    val withNull = Rendezvous.assign(
      Seq(Some("a"), None).toDF("k"), col("k"), 0 until 4).collect()
    assert(withNull.length == 2 && withNull.forall(r => !r.isNullAt(1)))
    // ... but a real key that STARTS with NUL must fail loudly, because it
    // would otherwise silently share the sentinel's shard family
    val e = intercept[Exception] {
      Rendezvous.assign(Seq(" evil").toDF("k"), col("k"), 0 until 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NULL sentinel")), s"got: ${msgs(e)}")
  }

  test("q206 rendezvous assignment is shuffle-free (no Exchange before the rollup)") {
    import graft.operators.Rendezvous
    val docs = graft.model.Tables.load(spark, sf0001, "documents").select("doc_id")
    val plan = Rendezvous.assign(docs, org.apache.spark.sql.functions.col("doc_id"),
      0 until 16).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must be map-side only:\n$plan")
  }

  test("clampedFoldStream: out-of-order arrivals fold in event-time order; late rows drop") {
    import spark.implicits._
    import graft.streaming.Stateful
    implicit val ctx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Stateful.BalEv]
    val q = Stateful.clampedFoldStream(ms.toDS(), delay = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("clamped").start()
    def ev(sec: Long, id: Long, d: Long) =
      Stateful.BalEv("u", new java.sql.Timestamp(sec * 1000L), id, d)
    try {
      // trigger 1: t=100 (+5) and t=300 (-8) arrive; t=200 (-3) is missing
      ms.addData(ev(100, 1, 5), ev(300, 3, -8))
      q.processAllAvailable()
      // trigger 2: the gap event arrives BEFORE the watermark passes it
      ms.addData(ev(200, 2, -3))
      q.processAllAvailable()
      // trigger 3: watermark pusher -> all three fold in (ts, id) order:
      // 5 -> max(0,5-3)=2 -> max(0,2-8)=0
      ms.addData(ev(100000, 99, 0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT id, bal FROM clamped WHERE key = 'u' ORDER BY tsUs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toList
      assert(rows == List((1L, 5L), (2L, 2L), (3L, 0L)), s"got $rows")
      // a LATE row (below the pushed watermark) must be dropped, not folded
      ms.addData(ev(150, 4, 1000))
      q.processAllAvailable()
      val n = spark.sql("SELECT COUNT(*) FROM clamped WHERE key = 'u'").collect()(0).getLong(0)
      assert(n == 3L, "late row leaked into the fold")
    } finally q.stop()
  }

  test("IntervalOverlapJoin == naive theta join, incl. pairs spanning many buckets") {
    import graft.operators.IntervalOverlapJoin
    import org.apache.spark.sql.functions.{col, least, greatest}
    val rnd = new scala.util.Random(7)
    val day = 86400000000L
    // intervals up to 3 days long -> many pairs share several day buckets;
    // the overlap-start-bucket keeper must still emit each pair ONCE
    val lrows = (0 until 120).map { i =>
      val s = rnd.nextLong(10 * day); (i.toLong % 5, s, s + 1 + rnd.nextLong(3 * day), i.toLong)
    }
    val rrows = (0 until 120).map { i =>
      val s = rnd.nextLong(10 * day); (i.toLong % 5, s, s + 1 + rnd.nextLong(3 * day), i.toLong)
    }
    import spark.implicits._
    val l = lrows.toDF("k", "ls", "le", "lid")
    val r = rrows.toDF("k", "rs", "re", "rid")
    val got = IntervalOverlapJoin.join(l, r, Seq("k"), "ls", "le", "rs", "re", day)
      .select("k", "lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val naive = l.join(r, l("k") === r("k") && l("ls") < r("re") && r("rs") < l("le"))
      .select(l("k"), col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(got.length == naive.length && got.toSet == naive.toSet,
      s"bucketed ${got.length} pairs vs naive ${naive.length}")
    // the overlap measure agrees too
    val govl = IntervalOverlapJoin.join(l, r, Seq("k"), "ls", "le", "rs", "re", day)
      .select((least(col("le"), col("re")) - greatest(col("ls"), col("rs"))).as("ov"))
      .collect().map(_.getLong(0)).sum
    val novl = l.join(r, l("k") === r("k") && l("ls") < r("re") && r("rs") < l("le"))
      .select((least(col("le"), col("re")) - greatest(col("ls"), col("rs"))).as("ov"))
      .collect().map(_.getLong(0)).sum
    assert(govl == novl)
  }

  test("IntervalOverlapJoin: degenerate EMPTY intervals (le == ls) match nothing") {
    import graft.operators.IntervalOverlapJoin
    import spark.implicits._
    val day = 86400000000L
    // an empty [t, t) nested strictly inside a fat interval, and an empty
    // interval on the right side too — half-open semantics say neither
    // contains any instant, so no pair may be emitted (and the bucket
    // sequence must not run descending)
    val l = Seq((1L, 100L, 100L, 1L), (1L, 0L, day, 2L)).toDF("k", "ls", "le", "lid")
    val r = Seq((1L, 50L, 50L, 10L), (1L, 10L, 200L, 11L)).toDF("k", "rs", "re", "rid")
    val got = IntervalOverlapJoin.join(l, r, Seq("k"), "ls", "le", "rs", "re", day)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((2L, 11L)), s"empty intervals leaked pairs: $got")
  }

  test("rendezvous: NULL keys land together on one well-defined shard") {
    import graft.operators.Rendezvous
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val ids: Seq[java.lang.Long] =
      Seq[java.lang.Long](1L, 2L, 3L, null, null)
    val df = ids.toDF("id")
    val rows = Rendezvous.assign(df, col("id"), 0 until 8).collect()
      .map(r => (Option(r.get(0)), r.getAs[Int]("shard")))
    // every row — null keys included — gets a non-null shard in range
    assert(rows.forall { case (_, sh) => sh >= 0 && sh < 8 }, s"bad shards: ${rows.toSeq}")
    // all null keys agree (they hash the same sentinel)
    assert(rows.filter(_._1.isEmpty).map(_._2).distinct.length == 1)
    // non-null assignments are untouched by the null rows being present
    val solo = Rendezvous.assign(Seq(1L, 2L, 3L).toDF("id"), col("id"), 0 until 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("shard")).toMap
    rows.collect { case (Some(v), sh) => assert(solo(v.asInstanceOf[Long]) == sh) }
  }

  test("q208 plan: equi join on (key, bucket), no cartesian, no dedup shuffle") {
    val plan = SparkEntry.queries("q208_overlap_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "overlap join degenerated to a cartesian")
    assert(!plan.contains("Deduplicate") && !plan.toLowerCase.contains("distinct"),
      "the overlap-start-bucket keeper should replace the dedup shuffle")
  }

  test("q209 TWA balance: hand-computed piecewise integration") {
    val dir = tmpDir("ivl209")
    // B: 10 (for 100 s), then 6 (for 200 s) -> TWA = (10*100 + 6*200)/300
    writeEvents(dir, Seq(
      (1L, 0L, 0L, "signup", 10.0), (2L, 100L, 0L, "click", 4.0),
      (3L, 300L, 0L, "view", 1.0)))
    val r = SparkEntry.queries("q209_twa_balance")(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("span_us") == 300L * 1000000L)
    assert(r.head.getAs[Long]("twa_micro") == 2200L * 1000000L / 300L)
    // single-event users (zero span) are excluded, not divided by zero
    val dir2 = tmpDir("ivl209b")
    writeEvents(dir2, Seq((1L, 0L, 0L, "signup", 10.0)))
    assert(SparkEntry.queries("q209_twa_balance")(spark, dir2).collect().isEmpty)
  }

  test("q212 reorder policy: hand-computed (s,S) walk") {
    val dir = tmpDir("ivl212")
    // demands 250, 200, 100 (µM): 500->250, 250-200=50 < 100 -> reorder to
    // 500 (count 1), 500-100=400
    writeEvents(dir, Seq(
      (1L, 1L, 0L, "view", 250.0), (2L, 2L, 0L, "view", 200.0),
      (3L, 3L, 0L, "view", 100.0)))
    val r = SparkEntry.queries("q212_reorder_policy")(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("final_micro") == 400000000L)
    assert(r.head.getAs[Long]("n_reorders") == 1L)
  }

  test("q224 budget sample: sampled counts equal the quotas and sum to the budget") {
    val rows = SparkEntry.queries("q224_budget_sample")(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") == r.getAs[Long]("alloc"),
        s"${r.getAs[String]("source")}: sampled != quota (no source saturates at 25 docs/source)")
    }
    assert(rows.map(_.getAs[Long]("n_sampled")).sum == 100L)
  }

  test("q204 is measure-preserving vs q201 on the fixture") {
    val covered = SparkEntry.queries("q201_interval_union")(spark, sf0001)
      .collect().map(_.getAs[Long]("covered_us")).sum
    val active = SparkEntry.queries("q204_daily_utilization")(spark, sf0001)
      .collect().map(_.getAs[Long]("active_us")).sum
    assert(covered == active)
  }
}
