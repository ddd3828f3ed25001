package graft

import org.scalatest.funsuite.AnyFunSuite

class TickGenSourceSpec extends AnyFunSuite {
  import TestSpark._

  test("DSv2 tick source streams deterministic batches through the ingest chain") {
    val ticks = spark.readStream.format("graft.sources.TickGenProvider")
      .option("ticksPerBatch", "5000")
      .option("startMs", "1710000000000")
      .option("msPerTick", "10")
      .load()
    assert(ticks.isStreaming)
    assert(ticks.schema == graft.streaming.Ingest.tickSchema)

    val q = graft.streaming.Ingest.toBtcusdt(ticks)
      .writeStream.format("memory").queryName("tickgen").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.sql("SELECT * FROM tickgen ORDER BY bid").collect()
    assert(rows.length == 5000)
    // deterministic generation: tick 0 and tick 4999 exact
    assert(rows.head.getLong(0) == 0L)
    assert(rows.head.getAs[java.math.BigDecimal]("price") == new java.math.BigDecimal("26000.00"))
    assert(rows.last.getLong(0) == 4999L)
    // 5000 ticks at 10ms = 50s -> one distinct minute bucket edge check
    val minutes = spark.sql(
      "SELECT count(distinct date_trunc('minute', time)) FROM tickgen").collect().head.getLong(0)
    assert(minutes == 1L)
  }

  test("recovery replays identical rows (pure-function offsets)") {
    import org.apache.spark.sql.functions._
    val read = () => {
      val ticks = spark.readStream.format("graft.sources.TickGenProvider")
        .option("ticksPerBatch", "1000").load()
      val name = s"tg_${System.nanoTime()}"
      val q = ticks.writeStream.format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.sql(s"SELECT sum(tradeId), count(*) FROM $name").collect().head
    }
    val a = read(); val b = read()
    assert(a == b)
  }
}
