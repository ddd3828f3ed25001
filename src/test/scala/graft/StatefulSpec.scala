package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TradeTick
import graft.streaming.Stateful

class StatefulSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming session windows split on the gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val events = ms.toDF().toDF("user_id", "ts")
    val q = Stateful.sessionCounts(events, gap = "30 minutes", watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    try {
      // user 1: two bursts 40 min apart -> 2 sessions; user 2: one session
      ms.addData(
        (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
        (1L, ts("2024-01-01 10:50:00")),
        (2L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // advance watermark far enough to close all sessions
      ms.addData((99L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events FROM sessions ORDER BY user_id, session_start")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toList
      assert(rows == List((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("stream-static enrich joins the symbol dimension") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[TradeTick]
    val dim = Seq(("BTCUSDT", "Bitcoin"), ("ETHUSDT", "Ether")).toDF("symbol", "asset")
    val q = Stateful.enrich(ms.toDF(), dim)
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    try {
      ms.addData(TradeTick(1, "BTCUSDT", "1.0", "1.00000000", 0L, true))
      q.processAllAvailable()
      val r = spark.sql("SELECT asset FROM enriched").collect()
      assert(r.map(_.getString(0)).toSeq == Seq("Bitcoin"))
    } finally q.stop()
  }
}
