package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.TradeTick

/** Stateful streaming operators (SURVEY §2.2 [EXT] streaming rows): running
  * OHLC per symbol via arbitrary state, session windows, watermarked dedup.
  * State case classes are versioned from day one (SURVEY §7.4).
  */
object Stateful {

  /** Versioned running-OHLC state (v1). */
  final case class OhlcStateV1(
      version: Int,
      windowStartSec: Long,
      open: Double, high: Double, low: Double, close: Double,
      volume: Double, count: Long)

  /** One emitted OHLC bar per (symbol, minute). */
  final case class OhlcBar(
      symbol: String, windowStartSec: Long,
      open: Double, high: Double, low: Double, close: Double,
      volume: Double, count: Long)

  /** The per-group OHLC fold shared by BOTH stateful operators
    * ([[runningOhlc]] v1 and [[runningOhlcTws]]) — one definition so the
    * twins can never diverge on rotation or late-tick policy. Sorts the
    * batch's ticks, folds them into the carried state, appends closed bars
    * to `out`, returns the state to carry.
    *
    * Policy: a bar emits when the first tick of a LATER minute arrives
    * (the reference's rotation-on-next-bucket, `main.py:36-47`); a tick
    * for an ALREADY-ROTATED minute (cross-batch late) is dropped —
    * rotating backwards would emit a premature bar now and a duplicate
    * (symbol, window) bar later (watermark-0 semantics, the same rows the
    * reference loses).
    */
  private def foldTicks(symbol: String, carried: OhlcStateV1, ticks: Iterator[TradeTick],
      out: scala.collection.mutable.ArrayBuffer[OhlcBar]): OhlcStateV1 = {
    var st = carried
    ticks.toSeq.sortBy(t => (t.tradeTimeMs, t.tradeId)).foreach { t =>
      val w = t.tradeTimeMs / 60000 * 60
      val p = t.price.toDouble
      val q = t.qty.toDouble
      if (st == null) {
        st = OhlcStateV1(1, w, p, p, p, p, q, 1)
      } else if (w == st.windowStartSec) {
        st = st.copy(high = math.max(st.high, p), low = math.min(st.low, p),
          close = p, volume = st.volume + q, count = st.count + 1)
      } else if (w > st.windowStartSec) {
        out += OhlcBar(symbol, st.windowStartSec, st.open, st.high, st.low,
          st.close, st.volume, st.count)
        st = OhlcStateV1(1, w, p, p, p, p, q, 1)
      } // w < current window: cross-batch late tick, dropped (see above)
    }
    st
  }

  /** Running per-symbol 1-minute OHLCV with data-driven window close — the
    * reference's rotation-on-next-bucket (`main.py:36-47`) as arbitrary
    * state: a bar is emitted when the first tick of a LATER minute arrives,
    * mirroring "window closes when the next minute's first record shows up".
    *
    * flatMapGroupsWithState keeps exactly one small state record per symbol —
    * at 1000 symbols that is 1000 rows of state regardless of tick volume.
    */
  def runningOhlc(ticks: Dataset[TradeTick]): Dataset[OhlcBar] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.symbol)
      .flatMapGroupsWithState[OhlcStateV1, OhlcBar](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (symbol, it, state: GroupState[OhlcStateV1]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[OhlcBar]
          val st = foldTicks(symbol, state.getOption.orNull, it, out)
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** [[runningOhlc]] on the transformWithState API (Spark 4's successor to
    * flatMapGroupsWithState): identical rotation semantics — a bar emits
    * when the first tick of a LATER minute arrives; cross-batch late ticks
    * drop (watermark-0, the reference's rotation-on-next-bucket loss class).
    * Differences that matter operationally: named typed state
    * (`getValueState("ohlc", …)`) lives in the RocksDB state store (the
    * provider transformWithState requires), giving per-key state TTL,
    * schema evolution and state rebalancing for free — the production
    * posture at 1000-symbol × multi-day uptime. StatefulSpec pins
    * bar-for-bar parity against the v1 operator on a replayed stream.
    */
  class OhlcProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, TradeTick, OhlcBar] {
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[OhlcStateV1] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      state = getHandle.getValueState[OhlcStateV1]("ohlc",
        org.apache.spark.sql.Encoders.product[OhlcStateV1], TTLConfig.NONE)
    }

    override def handleInputRows(symbol: String, rows: Iterator[TradeTick],
        timers: TimerValues): Iterator[OhlcBar] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[OhlcBar]
      val st = foldTicks(symbol, if (state.exists()) state.get() else null, rows, out)
      if (st != null) state.update(st)
      out.iterator
    }
  }

  /** transformWithState flavor of [[runningOhlc]] (see [[OhlcProcessor]]).
    * The session must run the RocksDB state store provider:
    * `spark.sql.streaming.stateStore.providerClass=
    * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`.
    */
  def runningOhlcTws(ticks: Dataset[TradeTick]): Dataset[OhlcBar] = {
    import ticks.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ticks.groupByKey(_.symbol)
      .transformWithState(new OhlcProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Session-window aggregation (gap-based), the streaming twin of Q23. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Stateful streaming dedup keyed on tradeId, state bounded by the
    * watermark — the fix for the reference's double-load gap at the record
    * level.
    */
  def dedupTicks(ticks: DataFrame, watermark: String = "1 minute"): DataFrame =
    ticks
      .withColumn("eventTime", timestamp_millis(col("tradeTimeMs")))
      .withWatermark("eventTime", watermark)
      .dropDuplicatesWithinWatermark("tradeId")

  /** Stream-static join: enrich live ticks with a static symbol dimension. */
  def enrich(ticks: DataFrame, symbolDim: DataFrame): DataFrame =
    ticks.join(broadcast(symbolDim), Seq("symbol"), "left")

  /** Streaming dedup against a STATIC corpus (the "is this new document
    * already in the training set" gate of an LLM data pipeline): left-anti
    * join of the stream against the corpus's content hashes, then stateful
    * within-stream dedup so a document arriving twice in one run also passes
    * only once. The corpus side is a static DataFrame of md5 keys — Spark
    * re-plans it per micro-batch, so at 100 TB it should be a compact
    * hash-only table (one 16-byte column), not the full corpus.
    */
  def dedupAgainstCorpus(docs: DataFrame, corpus: DataFrame,
      textCol: String = "text", watermark: String = "1 hour"): DataFrame = {
    val corpusHashes = corpus.select(md5(col(textCol)).as("_h")).distinct()
    docs
      .withColumn("_h", md5(col(textCol)))
      .join(corpusHashes, Seq("_h"), "left_anti")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("_h")
      .drop("_h")
  }

  /** Stream-static AS-OF enrichment (the SCD-2 lookup a tick loader wants:
    * each live event joined to the dimension version in force AT ITS EVENT
    * TIME, not the current one). The versioned dimension (key, `dimTsCol` =
    * version-effective-from, payload…) is turned into half-open validity
    * intervals `[validFrom, nextFrom)` with one BATCH-side window pass,
    * then every micro-batch row equi-joins on the key with a residual
    * interval predicate — exactly one version matches per row, left-outer
    * keeps rows older than the first version (null payload).
    *
    * Scale: the interval table is dimension-sized (versions, not facts) —
    * broadcast. A fact-sized "dimension" should go through the native
    * batch as-of (`AsOfJoin.backwardNative`) in `foreachBatch` instead.
    * StatefulSpec pins row-for-row parity with that batch operator.
    */
  def asOfEnrich(stream: DataFrame, versionedDim: DataFrame, key: String,
      tsCol: String, dimTsCol: String): DataFrame = {
    require(tsCol != dimTsCol,
      s"stream ts column '$tsCol' and dim version column '$dimTsCol' must differ")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(dimTsCol))
    val intervals = versionedDim.withColumn("_valid_to", lead(col(dimTsCol), 1).over(w))
    stream.join(broadcast(intervals),
      stream(key) === intervals(key) &&
        col(tsCol) >= col(dimTsCol) &&
        (col("_valid_to").isNull || col(tsCol) < col("_valid_to")),
      "left_outer")
      .drop(intervals(key)).drop("_valid_to")
  }

  /** Stream-stream interval join: match each left event to right events on
    * the same key within `[left.ts - tolerance, left.ts]` (the streaming
    * twin of RangeJoin.backwardWindow). BOTH sides carry a watermark and the
    * join condition bounds event time in both directions, so Spark can
    * derive state-eviction watermarks for each side — without the time
    * bound, stream-stream state grows forever. Inner only (outer
    * stream-stream joins need the same bounds plus result-emission delay).
    *
    * Input frames must expose (key, ts [timestamp], payload...); the right
    * timestamp is emitted as `r_ts`, right payload columns keep their names
    * (they must not collide with left's).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      tolerance: String = "10 minutes", watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right
      .withColumnRenamed("ts", "r_ts")
      .withWatermark("r_ts", watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.r_ts") >= col("l.ts") - expr(s"INTERVAL $tolerance") &&
        col("r.r_ts") <= col("l.ts"),
      "inner")
      .drop(col(s"r.$key"))
  }
}
