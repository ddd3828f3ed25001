package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LogTopic

/** Kafka-shaped log-topic source: per-partition offsets, admission-capped
  * triggers, checkpoint seek/replay recovery, live tailing of newly
  * produced segments, and consumer-commit markers.
  */
class LogTopicSpec extends AnyFunSuite {
  import TestSpark._

  private def sinkCount(out: String): Long =
    try spark.read.parquet(out).count()
    catch { case _: Throwable => 0L }

  private def startQuery(topic: String, out: String, ck: String,
      maxPerTrigger: Int = 300) = {
    spark.readStream.format("graft.sources.LogTopicProvider")
      .option("path", topic)
      .option("maxPerTrigger", maxPerTrigger.toString)
      .load()
      .writeStream
      .trigger(Trigger.ProcessingTime(50))
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/batch=$id")
      }
      .start()
  }

  private def waitFor(q: org.apache.spark.sql.streaming.StreamingQuery,
      out: String, minRows: Long): Unit = {
    val deadline = System.currentTimeMillis() + 120000
    while (sinkCount(out) < minRows && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      q.exception.foreach(throw _)
    }
    assert(sinkCount(out) >= minRows, s"sink never reached $minRows rows")
  }

  test("producer/listing primitives: contiguous segments, end offsets from names") {
    val topic = tmpDir("logtopic-prims")
    LogTopic.append(topic, 0, (0 until 100).map(i => s"a$i"))
    LogTopic.append(topic, 0, (0 until 50).map(i => s"b$i"))
    LogTopic.append(topic, 1, (0 until 30).map(i => s"c$i"))
    assert(LogTopic.partitions(topic) == Seq(0, 1))
    assert(LogTopic.endOffset(topic, 0) == 150L)
    assert(LogTopic.endOffset(topic, 1) == 30L)
    assert(LogTopic.segments(topic, 0).map { case (s, n, _) => (s, n) }
      == Seq((0L, 100L), (100L, 50L)))
  }

  test("idempotent producer: retry with expectedStart is a no-op; gaps fail loudly") {
    val topic = tmpDir("logtopic-idem")
    assert(LogTopic.append(topic, 0, Seq("a", "b"), expectedStart = Some(0L)))
    // retry of the same batch (producer crash after publish): no-op
    assert(!LogTopic.append(topic, 0, Seq("a", "b"), expectedStart = Some(0L)))
    assert(LogTopic.endOffset(topic, 0) == 2L)
    // next batch proceeds
    assert(LogTopic.append(topic, 0, Seq("c"), expectedStart = Some(2L)))
    assert(LogTopic.endOffset(topic, 0) == 3L)
    // a producer that thinks it is ahead of the head = lost segment: loud
    intercept[IllegalStateException] {
      LogTopic.append(topic, 0, Seq("x"), expectedStart = Some(10L))
    }
  }

  test("retention truncation: prefix segments below the floor go, reads start at first retained") {
    import org.apache.spark.sql.functions.{col, min => smin, max => smax, count => scount, lit}
    val topic = tmpDir("logtopic-trunc")
    (0 until 4).foreach(i =>
      LogTopic.append(topic, 0, (0 until 100).map(j => s"s$i-$j")))
    // floor 250: segments [0,100) and [100,200) deleted; [200,300) straddles — kept
    assert(LogTopic.truncate(topic, Map(0 -> 250L)) == 2)
    assert(LogTopic.segments(topic, 0).map(_._1) == Seq(200L, 300L))
    assert(LogTopic.endOffset(topic, 0) == 400L)
    // floor at the head: the active (newest) segment is still retained
    assert(LogTopic.truncate(topic, Map(0 -> 400L)) == 1)
    assert(LogTopic.segments(topic, 0).map(_._1) == Seq(300L))
    // a fresh consumer starts at the first RETAINED offset, not 0
    val base = tmpDir("logtopic-trunc-read")
    val q = startQuery(topic, s"$base/out", s"$base/ck")
    try waitFor(q, s"$base/out", 100) finally q.stop()
    val got = spark.read.parquet(s"$base/out")
      .agg(scount(lit(1)), smin(col("offset")), smax(col("offset"))).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((100L, 300L, 399L)))
    // producer numbering stays monotone after truncation
    LogTopic.append(topic, 0, Seq("tail"))
    assert(LogTopic.endOffset(topic, 0) == 401L)
  }

  test("stream: exactly-once with bounded triggers; kill/restart seeks from checkpoint") {
    val base = tmpDir("logtopic-recover")
    val (topic, out, ck) = (s"$base/topic", s"$base/out", s"$base/ck")
    // 3 partitions, uneven sizes
    LogTopic.append(topic, 0, (0 until 2000).map(i => s"p0-$i"))
    LogTopic.append(topic, 1, (0 until 1200).map(i => s"p1-$i"))
    LogTopic.append(topic, 2, (0 until 300).map(i => s"p2-$i"))

    // phase 1: consume part of the topic, then kill
    val q1 = startQuery(topic, out, ck)
    try waitFor(q1, out, 1000) finally q1.stop()
    val afterKill = sinkCount(out)

    // phase 2: restart from checkpoint; produce MORE while running (tail)
    val q2 = startQuery(topic, out, ck)
    try {
      waitFor(q2, out, 3500)
      LogTopic.append(topic, 0, (0 until 400).map(i => s"p0-late-$i"))
      LogTopic.append(topic, 2, (0 until 100).map(i => s"p2-late-$i"))
      waitFor(q2, out, 4000)
    } finally q2.stop()

    val got = spark.read.parquet(out)
    // exactly-once across the kill: every (partition, offset) exactly once,
    // contiguous from 0 to the produced head
    val perPart = got.groupBy(col("partition"))
      .agg(count(lit(1)).as("n"), countDistinct(col("offset")).as("nd"),
        min(col("offset")).as("lo"), max(col("offset")).as("hi"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(perPart(0) == ((2400L, 2400L, 0L, 2399L)), s"p0: ${perPart(0)} (killed at $afterKill)")
    assert(perPart(1) == ((1200L, 1200L, 0L, 1199L)))
    assert(perPart(2) == ((400L, 400L, 0L, 399L)))
    // values line up with offsets (replay is byte-identical)
    val v = got.filter(col("partition") === 0 && col("offset") === 2100L)
      .select("value").collect().head.getString(0)
    assert(v == "p0-late-100")
    // admission control: no trigger exceeded maxPerTrigger rows
    val batchSizes = spark.read.parquet(out)
      .groupBy(col("batch")).count().collect().map(_.getLong(1))
    assert(batchSizes.forall(_ <= 300L),
      s"a trigger exceeded the admission cap: ${batchSizes.max}")
    // consumer-commit marker: the engine commits batch N as N+1 starts, so
    // at stop the marker may trail the head by up to one admission-capped
    // trigger — never lead it, never miss a partition
    val committed = LogTopic.committed(topic)
    val heads = Map(0 -> 2400L, 1 -> 1200L, 2 -> 400L)
    assert(committed.keySet == heads.keySet, s"committed=$committed")
    heads.foreach { case (p, head) =>
      assert(committed(p) <= head && committed(p) >= head - 300L,
        s"p$p committed=${committed(p)} head=$head")
    }
  }
}
