package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WebSocketIO
import graft.tools.TickSocketServer

/** RFC-6455 framing pins (frame shapes a real feed will produce) + the
  * kill/restart recovery twin of TickSocketSpec running entirely over
  * WebSocket transport — closing the R1 live-mode transport gap (the
  * reference consumes a WebSocket, main.py:30-35).
  */
class WebSocketSpec extends AnyFunSuite {
  import TestSpark._

  // deterministic "random" masks keep the byte-level tests reproducible
  private def rnd = new java.util.Random(7)

  test("frame round trip: masked and unmasked, 7/16/64-bit lengths") {
    for (n <- Seq(0, 1, 125, 126, 4000, 65535, 70000)) {
      val text = "x" * n
      for (masked <- Seq(true, false)) {
        val out = new ByteArrayOutputStream()
        if (masked) WebSocketIO.writeMaskedText(out, text, rnd)
        else WebSocketIO.writeText(out, text)
        val got = WebSocketIO.readText(
          new ByteArrayInputStream(out.toByteArray), new ByteArrayOutputStream())
        assert(got.contains(text), s"n=$n masked=$masked")
      }
    }
  }

  test("fragmented text message reassembles; interleaved ping answered with pong") {
    // hand-built: TEXT(fin=0,"he") PING("p") CONT(fin=0,"ll") CONT(fin=1,"o")
    val buf = new ByteArrayOutputStream()
    def frame(fin: Boolean, op: Int, payload: String): Unit = {
      buf.write((if (fin) 0x80 else 0x00) | op)
      buf.write(payload.length)
      buf.write(payload.getBytes("UTF-8"))
    }
    frame(fin = false, 0x1, "he")
    frame(fin = true, 0x9, "p")
    frame(fin = false, 0x0, "ll")
    frame(fin = true, 0x0, "o")
    val replies = new ByteArrayOutputStream()
    val got = WebSocketIO.readText(
      new ByteArrayInputStream(buf.toByteArray), replies)
    assert(got.contains("hello"))
    // pong = 0x8A, len 1, payload 'p' (echoed)
    assert(replies.toByteArray.toSeq == Seq(0x8A.toByte, 0x01.toByte, 'p'.toByte))
  }

  test("oversized frame is rejected instead of buffered into heap") {
    // 64-bit length header claiming 1 GiB — must refuse before allocating
    val buf = new ByteArrayOutputStream()
    buf.write(0x81); buf.write(127)
    val len = 1L << 30
    (56 to 0 by -8).foreach(i => buf.write(((len >>> i) & 0xff).toInt))
    intercept[IllegalArgumentException] {
      WebSocketIO.readText(
        new ByteArrayInputStream(buf.toByteArray), new ByteArrayOutputStream())
    }
  }

  test("close frame surfaces as end-of-stream and is answered with close") {
    val buf = new ByteArrayOutputStream()
    buf.write(0x88); buf.write(0x00) // CLOSE, empty
    val replies = new ByteArrayOutputStream()
    val got = WebSocketIO.readText(
      new ByteArrayInputStream(buf.toByteArray), replies)
    assert(got.isEmpty)
    assert(replies.toByteArray.toSeq == Seq(0x88.toByte, 0x00.toByte))
  }

  test("handshake accept key matches the RFC-6455 worked example") {
    // the key/accept pair from RFC 6455 §1.3
    assert(WebSocketIO.acceptKeyFor("dGhlIHNhbXBsZSBub25jZQ==")
      == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  private def sinkCount(out: String): Long =
    try spark.read.parquet(out).count()
    catch { case _: Throwable => 0L }

  private def runUntil(port: Int, out: String, ck: String, minRows: Long): Unit = {
    val stream = spark.readStream.format("graft.sources.TickSocketProvider")
      .option("port", port.toString)
      .option("transport", "ws")
      .option("maxPerTrigger", "500")
      .option("numPartitions", "4")
      .load()
    val q = stream.writeStream
      .trigger(Trigger.ProcessingTime(50))
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
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
    } finally q.stop()
  }

  test("WS transport: kill mid-stream + restart from checkpoint = no dup, no loss") {
    val base = tmpDir("tickws")
    val (out, ck) = (s"$base/out", s"$base/ck")

    val s1 = new TickSocketServer(ws = true).start()
    try runUntil(s1.port, out, ck, minRows = 1500) finally s1.close()

    val s2 = new TickSocketServer(ws = true).start()
    try {
      runUntil(s2.port, out, ck, minRows = 4000)
      assert(s2.lastResume > 0,
        "restarted WS source did not resume mid-stream")
    } finally s2.close()

    val got = spark.read.parquet(out)
    val stats = got.agg(
      count(lit(1)).as("n"),
      countDistinct(col("tradeId")).as("nd"),
      min(col("tradeId")).as("lo"),
      max(col("tradeId")).as("hi")).collect().head
    val (n, nd, lo, hi) = (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
    assert(n == nd, s"duplicates after WS restart: $n rows, $nd distinct")
    assert(lo == 0L && hi == n - 1, s"gap/offset in WS-recovered stream: lo=$lo hi=$hi n=$n")
    assert(n >= 4000)
  }
}
