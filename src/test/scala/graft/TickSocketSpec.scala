package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.TickSocketServer

/** Live socket source (sources.TickSocketProvider) against the loopback
  * RESUME-protocol server: a query is killed mid-stream and restarted from
  * its checkpoint against a FRESH server connection; the reassembled sink
  * must be exactly the sequence prefix — no duplicates, no gaps — proving
  * offset-tracked recovery end-to-end (the R1 live-mode contract,
  * main.py:30-35, without egress).
  */
class TickSocketSpec extends AnyFunSuite {
  import TestSpark._

  private def sinkCount(out: String): Long =
    try spark.read.parquet(out).count()
    catch { case _: Throwable => 0L } // sink dir not created / mid-overwrite

  private def runUntil(port: Int, out: String, ck: String, minRows: Long): Unit = {
    val stream = spark.readStream.format("graft.sources.TickSocketProvider")
      .option("port", port.toString)
      .option("maxPerTrigger", "500")
      .option("numPartitions", "4")
      .load()
    val q = stream.writeStream
      .trigger(Trigger.ProcessingTime(50))
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // idempotent sink: a re-run batch overwrites its own directory
        batch.write.mode("overwrite").parquet(s"$out/batch=$id")
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (sinkCount(out) < minRows && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        q.exception.foreach(throw _)
      }
      assert(sinkCount(out) >= minRows, s"sink never reached $minRows rows")
    } finally q.stop() // the mid-stream kill
  }

  test("socket source: kill mid-stream + restart from checkpoint = no dup, no loss") {
    val base = tmpDir("ticksock")
    val (out, ck) = (s"$base/out", s"$base/ck")

    val s1 = new TickSocketServer().start()
    try runUntil(s1.port, out, ck, minRows = 1500) finally s1.close()

    // restart: only the CHECKPOINT carries position; the new server knows
    // nothing until the source asks it to RESUME from the recovered offset
    val s2 = new TickSocketServer().start()
    try {
      runUntil(s2.port, out, ck, minRows = 4000)
      assert(s2.lastResume > 0,
        "restarted source did not resume mid-stream (RESUME 0 = replayed from scratch)")
    } finally s2.close()

    val got = spark.read.parquet(out) // batch=N discovered as a partition col
    val stats = got.agg(
      count(lit(1)).as("n"),
      countDistinct(col("tradeId")).as("nd"),
      min(col("tradeId")).as("lo"),
      max(col("tradeId")).as("hi")).collect().head
    val (n, nd, lo, hi) = (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
    assert(n == nd, s"duplicates after restart: $n rows, $nd distinct")
    assert(lo == 0L, s"stream did not start at sequence 0 (lo=$lo)")
    assert(hi == n - 1, s"gap in recovered stream: max=$hi over $n rows")
    assert(n >= 4000)

    // content integrity: a sampled row matches the deterministic formula
    val sample = got.filter(col("tradeId") === 1234L)
      .select("symbol", "price", "qty", "tradeTimeMs", "isBuyerMaker").collect().head
    val (_, sym, p, q, t, m) = graft.sources.TickGen.at(1234L, 1710000000000L, 10L)
    assert(sample.getString(0) == sym && sample.getString(1) == p &&
      sample.getString(2) == q && sample.getLong(3) == t && sample.getBoolean(4) == m)
  }

  test("socket source: upstream dies mid-stream, reader auto-reconnects with RESUME") {
    val base = tmpDir("ticksock-up")
    val (out, ck) = (s"$base/out", s"$base/ck")

    // phase A: server on a fixed port dies while the QUERY KEEPS RUNNING
    val sA = new TickSocketServer().start()
    val port = sA.port
    val stream = spark.readStream.format("graft.sources.TickSocketProvider")
      .option("port", port.toString)
      .option("maxPerTrigger", "500")
      // small buffer cap: backpressure keeps the backlog tiny, so progress
      // past the failure point REQUIRES the reader's RESUME reconnect
      .option("maxBuffered", "2000")
      .load()
    val q = stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/batch=$id")
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (sinkCount(out) < 1000 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200); q.exception.foreach(throw _)
      }
      assert(sinkCount(out) >= 1000)
      sA.close() // upstream failure — the query stays up

      // phase B: replacement server binds the SAME port; the source's
      // reader must reconnect and RESUME at its next-needed sequence
      Thread.sleep(400)
      val sB = new TickSocketServer(fixedPort = port).start()
      try {
        // progress must pass the failure point AND the replacement server
        // must have seen a mid-sequence RESUME (kernel TCP buffers can
        // serve a backlog for a while before the reader hits EOF)
        val more = sinkCount(out) + 5000
        val deadline2 = System.currentTimeMillis() + 120000
        while ((sinkCount(out) < more || sB.lastResume <= 0) &&
            System.currentTimeMillis() < deadline2) {
          Thread.sleep(200); q.exception.foreach(throw _)
        }
        assert(sinkCount(out) >= more, "stream never progressed after upstream restart")
        assert(sB.lastResume > 0, "reconnect did not RESUME mid-sequence")
      } finally sB.close()
    } finally q.stop()

    val got = spark.read.parquet(out)
    val stats = got.agg(
      count(lit(1)).as("n"),
      countDistinct(col("tradeId")).as("nd"),
      max(col("tradeId")).as("hi")).collect().head
    val (n, nd, hi) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    assert(n == nd, s"duplicates across the upstream failure: $n rows, $nd distinct")
    assert(hi == n - 1, s"gap across the upstream failure: max=$hi over $n rows")
  }
}
