package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural and semantic pins for the q189-q197 family. */
class GraphStatSpec extends AnyFunSuite {
  import TestSpark._

  test("q189 BFS: no cartesian product; hop counts partition the node set") {
    val df = SparkEntry.queries("q189_bfs_hops")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "BFS round leaked a cartesian")
    val rows = df.collect().map(r => r.getAs[Long]("hop") -> r.getAs[Long]("n_nodes"))
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)), "ordered by hop")
    assert(rows.head._2 == 1L, "hop 0 is the single source")
    // all 200 sf0.001 co-purchase nodes are accounted for exactly once
    assert(rows.map(_._2).sum == 200L)
  }

  test("q192 bootstrap: deterministic across runs and CI brackets the estimate") {
    val build = SparkEntry.queries("q192_bootstrap_ci")
    val a = build(spark, sf0001).collect()
    val b = build(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq, "hash-derived resampling must be run-stable")
    a.foreach { r =>
      val (lo, mean, hi) = (r.getAs[Long]("lo_micro"), r.getAs[Long]("mean_micro"),
        r.getAs[Long]("hi_micro"))
      assert(lo <= hi, s"degenerate interval $lo > $hi")
      assert(lo <= mean && mean <= hi,
        s"90% bootstrap CI [$lo,$hi] should bracket the point mean $mean")
      assert(r.getAs[Long]("n_res") == 200L)
    }
  }

  test("q194 CEP: non-overlapping greedy counts on a hand tape") {
    import spark.implicits._
    // vvpvvvp -> v{2,}p matches twice; cpcp -> cp twice; eee -> e{2,} ONCE
    val df = Seq("vvpvvvpcpcpeee").toDF("tape")
      .select(
        size(regexp_extract_all(col("tape"), lit("v{2,}p"), lit(0))).as("a"),
        size(regexp_extract_all(col("tape"), lit("cp"), lit(0))).as("b"),
        size(regexp_extract_all(col("tape"), lit("e{2,}"), lit(0))).as("c"))
    assert(df.collect().head.toSeq == Seq(2, 2, 1))
  }

  test("q196 growth accounting: new+retained+resurrected equals WAU each week") {
    val led = SparkEntry.queries("q196_growth_accounting")(spark, sf0001).collect()
    val aw = graft.model.Tables.load(spark, sf0001, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) / 86400000000L).cast("long").as("d"))
      .select(col("user_id"), (col("d") / 7L).cast("long").as("w"))
      .distinct().groupBy("w").count()
      .collect().map(r => r.getAs[Long]("w") -> r.getAs[Long]("count")).toMap
    led.foreach { r =>
      val w = r.getAs[Long]("w")
      val sum = r.getAs[Long]("new_users") + r.getAs[Long]("retained") +
        r.getAs[Long]("resurrected")
      assert(sum == aw(w), s"week $w: ledger $sum != WAU ${aw(w)}")
    }
  }

  test("GlobalCumSum/GlobalRank validateOrder: loud on duplicates, silent on total orders") {
    import spark.implicits._
    val dup = Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.GlobalCumSum.withCumSum(
        dup, Seq(col("k")), col("v"), "c", validateOrder = true)
    }
    assert(e.getMessage.contains("not total"), e.getMessage)
    // a desc order with a unique tie-break passes (SortOrder unwrap works)
    val ok = graft.operators.GlobalRank.withRankColumns(
      dup, Seq(col("v").desc, col("k")), validateOrder = true)
    assert(ok.orderBy(col("rank")).select(col("v")).as[Long].collect()
      .toSeq == Seq(30L, 20L, 10L))
  }

  test("q197 deciles: shares sum to ~1e6 and the curve is monotone") {
    val rows = SparkEntry.queries("q197_decile_share")(spark, sf0001).collect()
    assert(rows.length == 10)
    val shares = rows.map(r => r.getAs[Long]("decile") -> r.getAs[Long]("share_ppm"))
    // floor-div ppm: total within [1e6 - 10, 1e6]
    val tot = shares.map(_._2).sum
    assert(tot <= 1000000L && tot >= 999990L, s"ppm total $tot")
    // ranked by activity DESC: decile 1 is the heaviest
    assert(shares.sortBy(_._1).map(_._2).sliding(2).forall(p => p(0) >= p(1)),
      s"non-monotone concentration curve: ${shares.toSeq}")
  }

  test("q205 k-core: leaf chain peels away over multiple rounds, triangle survives") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = tmpDir("kcore")
    // Graph A-B-C + triangle C-D-E. 2-core = {C,D,E}: round 1 peels A
    // (degree 1), round 2 peels B (leaf after A leaves) — a genuine
    // cascade, not a single-pass degree filter. Every edge needs
    // co-purchase support >= 2 -> two orders per edge.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 3L)) // A=1..E=5
    val rows = edges.zipWithIndex.flatMap { case ((x, y), i) =>
      Seq(2 * i, 2 * i + 1).flatMap(ok => Seq((ok.toLong, x), (ok.toLong, y)))
    }.map { case (ok, pk) =>
      (ok, pk, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", new Timestamp(0L))
    }
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q205_kcore")(spark, dir).collect()
      .map(x => x.getAs[Long]("pk") -> x.getAs[Long]("core_deg")).toMap
    assert(r == Map(3L -> 2L, 4L -> 2L, 5L -> 2L), s"got $r")
  }

  test("q211 degree histogram: buckets are exact bit-lengths and partition the nodes") {
    val rows = SparkEntry.queries("q211_degree_histogram")(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == 200L) // every sf0.001 node counted once
    rows.foreach { r =>
      val (b, lo, hi) = (r.getAs[Long]("bucket"), r.getAs[Long]("min_deg"),
        r.getAs[Long]("max_deg"))
      assert(lo >= (1L << (b - 1)) && hi < (1L << b),
        s"bucket $b holds degrees outside [2^${b - 1}, 2^$b): [$lo, $hi]")
    }
  }

  test("q210 ship latency: quantiles are ordered and drawn from real latencies") {
    val rows = SparkEntry.queries("q210_ship_latency")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, mx) = (r.getAs[Long]("p50_d"), r.getAs[Long]("p90_d"),
        r.getAs[Long]("max_d"))
      assert(p50 <= p90 && p90 <= mx, s"disordered quantiles: $p50 / $p90 / $mx")
      // NOTE: the synthetic fixture draws ship dates independently of order
      // dates, so negative latencies exist and are legitimate output. They
      // stay engine-exact because both dates are midnight-aligned — the µs
      // difference is a whole multiple of a day, where Spark's
      // truncate-toward-zero div and DuckDB's flooring // agree.
    }
  }
}
