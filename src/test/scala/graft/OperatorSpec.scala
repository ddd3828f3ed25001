package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, RangeJoin}
import graft.queries.VectorQueries

/** Unit semantics for the custom operators, pinned against tiny hand-checked
  * inputs (the DuckDB cross-check runs in tools/check.py at fixture scale).
  */
class OperatorSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join: latest right row at-or-before, per key, inclusive ties") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:05"), "c1"),
      (1L, ts("2024-01-01 10:00:10"), "c2"),
      (2L, ts("2024-01-01 10:00:01"), "c3")
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:03"), 3.0),
      (1L, ts("2024-01-01 10:00:10"), 10.0), // equal ts: must match c2 (inclusive)
      (2L, ts("2024-01-01 10:00:02"), 2.0)   // after c3: must NOT match
    ).toDF("user_id", "ts", "v")

    val out = AsOfJoin.backward(left, right, Seq("user_id"), "ts", Seq("v"), "m_")
      .select("tag", "m_v").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("c1") == Some(3.0))
    assert(out("c2") == Some(10.0))
    assert(out("c3") == None)
  }

  test("as-of join: NULL right payload survives and columns stay atomic per match") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:05"), "c1")).toDF("user_id", "ts", "tag")
    // newest right row at-or-before c1 carries v = NULL: the match must emit
    // (m_ts = 10:00:04, m_v = NULL), not borrow v = 3.0 from the older row.
    val right = Seq(
      (1L, ts("2024-01-01 10:00:03"), Some(3.0)),
      (1L, ts("2024-01-01 10:00:04"), None)
    ).toDF("user_id", "ts", "v")

    val row = AsOfJoin.backward(left, right, Seq("user_id"), "ts", Seq("v"), "m_")
      .select("m_ts", "m_v").collect().head
    assert(row.getTimestamp(0) == ts("2024-01-01 10:00:04"))
    assert(row.isNullAt(1))
  }

  test("range join: exactly the rows within (ts-window, ts], bucket edges included") {
    import spark.implicits._
    val probe = Seq((1L, ts("2024-01-01 10:10:00"), 100L)).toDF("user_id", "ts", "event_id")
    val cand = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L),  // exactly window lower bound: included
      (1L, ts("2024-01-01 10:04:59"), 2L),  // just outside: excluded
      (1L, ts("2024-01-01 10:10:00"), 3L),  // equal ts: included
      (1L, ts("2024-01-01 10:10:01"), 4L),  // future: excluded
      (2L, ts("2024-01-01 10:09:00"), 5L)   // other key: excluded
    ).toDF("user_id", "ts", "event_id")

    val got = RangeJoin.backwardWindow(probe, cand, Seq("user_id"), "ts", 300000000L)
      .select(col("r.event_id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("grouped top-k equals naive window ranking") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i % 5, i, (i * 37 % 101).toDouble))
      .toDF("g", "id", "score")
    val naive = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"score".desc, $"id")))
      .filter($"rn" <= 3).select($"g", $"rn".cast("long").as("rn"), $"id")
    val fast = VectorQueries.groupedTopK(df, "g", 3, Seq($"score".desc, $"id"))
      .select($"g", $"rn", $"id")
    assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0)
  }

  test("global rank equals native single-partition window functions") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy($"score".desc, $"id")
    // 203 rows, 4 tiles -> uneven NTILE split (3 wide tiles); duplicate
    // scores force the tiebreaker to carry the total order.
    val df = (1 to 203).map(i => (i.toLong, (i * 37 % 101).toDouble)).toDF("id", "score")
    val naive = df.select($"id",
      row_number().over(w).cast("long").as("rank"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      ntile(4).over(w).cast("long").as("tile"))
    val fast = graft.operators.GlobalRank
      .withRankColumns(df, Seq($"score".desc, $"id"), tiles = 4)
      .select($"id", $"rank", $"pr", $"cd", $"tile")
    assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0)
  }
}
