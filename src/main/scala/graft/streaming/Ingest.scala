package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** The reference's ingest path (`main.py`) re-expressed on Structured
  * Streaming: per-record transforms (R2-R6), 1-minute event-time tumbling
  * windows (R7), TSV file sink partitioned by window (R8/R9).
  *
  * Works identically on batch and streaming DataFrames — `toBtcusdt` is a
  * pure column mapping, so the same code serves replay tests and live runs.
  *
  * Intentional fixes over the reference, documented per SURVEY §2.1:
  *  - pure event time from the first record (the reference seeds its first
  *    window from processing time, `main.py:26`);
  *  - configurable watermark instead of the implicit 0 of a single ordered
  *    WebSocket;
  *  - exactly-once via checkpoint + idempotent batch writes (the reference
  *    double-loads on Lambda retry, `lambda_function.py:26-48`).
  */
object Ingest {

  /** Raw tick columns as they arrive (FIXTURES §A1). */
  val tickSchema: StructType = StructType(Seq(
    StructField("tradeId", LongType),
    StructField("symbol", StringType),
    StructField("price", StringType),
    StructField("qty", StringType),
    StructField("tradeTimeMs", LongType),
    StructField("isBuyerMaker", BooleanType)))

  /** R2-R6: tick → BTCUSDT row.
    *
    *  - price: string → double → round to 2 dp → DECIMAL(9,2). The reference
    *    (`main.py:63`) uses Python round = half-even, so `bround`, not
    *    `round` (SURVEY §2.2 math note).
    *  - quantity: `str(q)[:-3]` (`main.py:64`) — the reference TRUNCATES the
    *    8-dp string to 5 dp by chopping characters; reproduced literally,
    *    then cast exact.
    *  - time: epoch-ms → second-truncated timestamp (`main.py:56`), UTC
    *    (intentional fix of the reference's server-local zone).
    *  - maker: boolean kept typed; encodes to 0/1 at the TSV edge (R6).
    */
  def toBtcusdt(ticks: DataFrame): DataFrame =
    ticks.select(
      col("tradeId").as("bid"),
      col("symbol").as("parameter"),
      bround(col("price").cast("double"), 2).cast(DecimalType(9, 2)).as("price"),
      expr("substring(qty, 1, length(qty) - 3)").cast(DecimalType(10, 5)).as("quantity"),
      timestamp_seconds(expr("tradeTimeMs div 1000")).as("time"),
      col("isBuyerMaker").as("maker"))

  /** 1-minute tumbling window id: epoch seconds of the window start —
    * `int(T/60000) * 60`, exactly the reference's file-name key
    * (`main.py:27,36`).
    */
  def windowStartSec(tradeTimeMs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (tradeTimeMs / 60000).cast("long") * 60

  /** R7+R8: stream ticks to a TSV sink laid out one directory per 1-minute
    * window (`window_start=<epochSec>/part-*.csv`), no header, tab
    * separator, `time` rendered 'yyyy-MM-dd HH:mm:ss', maker as 0/1 —
    * the reference's file format (FIXTURES §A2) with Spark's
    * dir-per-partition layout standing in for file-per-window.
    *
    * An empty minute emits no directory, matching `main.py:36-38`.
    *
    * Lateness: an append file sink writes EVERY row — a late tick lands as
    * an extra part file in its (old) window directory. The `watermark`
    * parameter only bounds state when a stateful operator (windowed agg,
    * dedup) is composed upstream; it does not drop rows here. The reference
    * behaves strictly worse (late ticks re-open and re-upload old files,
    * double-loading them); true late-row dropping lives in
    * Stateful.runningOhlc (drops) and watermarked aggregations.
    */
  def windowedTsvSink(ticks: DataFrame, outDir: String, checkpointDir: String,
      watermark: String = "0 seconds"): StreamingQuery = {
    val rows = toBtcusdt(ticks.withWatermark("eventTime", watermark))
      .withColumn("window_start", expr("(unix_seconds(time) div 60) * 60"))
      .withColumn("time", date_format(col("time"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("maker", when(col("maker"), 1).otherwise(0))
    rows.writeStream
      .format("csv")
      .option("sep", "\t")
      .option("header", "false")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("window_start")
      .start()
  }

  /** Attach an event-time column for watermarking before `windowedTsvSink`. */
  def withEventTime(ticks: DataFrame): DataFrame =
    ticks.withColumn("eventTime", timestamp_millis(col("tradeTimeMs")))

  /** R1 live-mode stand-in: a synthetic tick stream from the rate source —
    * deterministic per (value), paced at `ticksPerSecond`. Replays the
    * reference's WebSocket shape without the network; swap for a DataSource
    * V2 MicroBatchStream for a real feed.
    */
  def syntheticTicks(spark: SparkSession, ticksPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", ticksPerSecond)
      .load()
      .select(
        col("value").as("tradeId"),
        lit("BTCUSDT").as("symbol"),
        graft.sources.TickGen.priceCol(col("value")).as("price"),
        graft.sources.TickGen.qtyCol(col("value")).as("qty"),
        unix_millis(col("timestamp")).as("tradeTimeMs"),
        graft.sources.TickGen.makerCol(col("value")).as("isBuyerMaker"))
}
