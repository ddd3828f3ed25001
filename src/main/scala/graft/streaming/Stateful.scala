package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.TradeTick

/** Stateful streaming operators (SURVEY §2.2 [EXT] streaming rows): running
  * OHLC per symbol via arbitrary state, session windows, watermarked dedup.
  * State case classes are versioned from day one (SURVEY §7.4).
  */
object Stateful extends Serializable {

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

  /** STREAMING CORPUS CURATION — the batch curation rules (q82) applied
    * incrementally to a live document feed, one composed operator:
    *
    *   1. exact dedup against the resident corpus (static md5-key anti-join)
    *      AND within the stream (`dropDuplicatesWithinWatermark`), via
    *      [[dedupAgainstCorpus]];
    *   2. quality gate — the integer-exact q82 thresholds (min tokens;
    *      repetition: duplicate-shingle mass below 2/5 of all shingles);
    *   3. decontamination — shared-shingle count against the BOUNDED eval
    *      set as a broadcast array literal (`array_intersect` is map-side
    *      codegen; no per-batch explode/aggregate, so the filter composes
    *      with any output mode).
    *
    * Everything is per-row or anti-join work: at 100 TB the corpus side is
    * a compact hash-only table and the eval set stays bounded by design, so
    * per-batch cost scales with the BATCH, never the resident corpus. The
    * near-dup (MinHash) stage is not chained in here: candidate banding
    * needs the corpus signature store. Run [[LshIndex.nearDupSink]] as a
    * second foreachBatch stage over what this gate admits — it maintains
    * that store incrementally (q236 pins it against the batch oracle) — or
    * fall back to the periodic batch compaction pass (the
    * lambda-architecture split).
    *
    * Duplicate-survivor semantics: within one micro-batch,
    * `dropDuplicatesWithinWatermark` keeps an ARBITRARY one of the
    * duplicates (arrival order, not quality) — unlike q82's batch curation,
    * which picks the quality-maximal representative per cluster. Streams
    * that need the quality-aware survivor must route duplicates through the
    * batch compaction pass above.
    */
  def curateStream(docs: DataFrame, corpus: DataFrame, evalShingles: Seq[String],
      contaminationThreshold: Int = 10, minTokens: Int = 12,
      watermark: String = "1 hour"): DataFrame = {
    import graft.functions.TextFunctions.{shingles3, shingles3Distinct, tokens}
    require(evalShingles.nonEmpty, "empty eval set: decontamination would be a no-op")
    // the within-stream dedup state needs an event-time column named `ts`
    // (dedupAgainstCorpus watermarks it) alongside `text`; check the TYPE
    // here too — a string ts would otherwise surface much later as an
    // unhelpful withWatermark analysis error
    require(docs.columns.contains("ts") && docs.columns.contains("text"),
      s"curateStream input needs (ts, text) columns, got: ${docs.columns.mkString(", ")}")
    require(docs.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"curateStream ts must be an event-time TIMESTAMP column, got: ${docs.schema("ts").dataType.sql}")
    dedupAgainstCorpus(docs, corpus, "text", watermark)
      .withColumn("_nt", size(tokens(col("text"))).cast("long"))
      .withColumn("_nsh", size(shingles3(col("text"))))
      .withColumn("_nd", size(shingles3Distinct(col("text"))))
      .withColumn("_hits",
        size(array_intersect(shingles3Distinct(col("text")), typedlit(evalShingles))))
      .filter(col("_nt") >= minTokens &&
        lit(5) * (col("_nsh") - col("_nd")) < lit(2) * col("_nsh") &&
        col("_hits") < contaminationThreshold)
      .drop("_nt", "_nsh", "_nd", "_hits")
  }

  // ---- stream-stream event-time AS-OF join -------------------------------

  /** One event on either side of the streaming as-of (side 1 = probe/left,
    * side 0 = reference/right). `id` disambiguates same-timestamp rights:
    * the match among equal-ts rights is the max-id one (the streaming twin
    * of q36's `max_by(value, event_id)` pre-aggregation).
    */
  final case class AsOfEv(key: String, ts: java.sql.Timestamp,
      side: Byte, id: Long, v: Double)

  /** Emitted probe row (timestamps in event-time MICROSECONDS — ms would
    * silently truncate the parquet micro-precision event times).
    */
  final case class AsOfOut(key: String, tsUs: Long, id: Long,
      mTsUs: Option[Long], mV: Option[Double])

  /** Versioned per-key buffers (v1): pending probes + reference rows, both
    * kept sorted ((tsUs, id) — equal-ts rights resolve to the max id).
    */
  final case class AsOfBufV1(version: Int,
      lefts: List[(Long, Long)],             // (tsUs, id)
      rights: List[(Long, Long, Double)])    // (tsUs, id, v)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Merge two individually sorted lists (stable: ties keep `a`'s element
    * first). The as-of buffers re-enter every trigger already sorted, so
    * inserting a trigger's arrivals is O(arrivals·log(arrivals) + buffer)
    * — re-sorting the whole buffer each trigger would pay
    * O(buffer·log(buffer)) per key-trigger, which a hot key with a large
    * in-window buffer turns into the dominant cost (StateScaleSpec drives
    * that shape).
    */
  private[streaming] def mergeSorted[T](a: List[T], b: List[T])
      (implicit ord: Ordering[T]): List[T] = {
    val buf = scala.collection.mutable.ListBuffer.empty[T]
    @annotation.tailrec
    def go(x: List[T], y: List[T]): Unit = (x, y) match {
      case (Nil, r) => buf ++= r
      case (l, Nil) => buf ++= l
      case (lh :: lt, rh :: rt) =>
        if (ord.lteq(lh, rh)) { buf += lh; go(lt, y) }
        else { buf += rh; go(x, rt) }
    }
    go(a, b)
    buf.toList
  }

  /** STREAM-STREAM event-time AS-OF join — the quote/trade lookup Spark's
    * built-in stream-stream joins cannot express (equi + interval only):
    * every left event is matched to the LATEST right event of the same key
    * at-or-before its event time, inclusive, left-outer.
    *
    * Correctness protocol (watermark-gated emission):
    *   - both sides share one union + one watermark; a probe emits only
    *     once the watermark passes STRICTLY beyond its timestamp — at that
    *     point no on-time right at-or-before it can still arrive;
    *   - per-key state is BOUNDED: pending probes sit inside the watermark
    *     window by construction, and of the reference rows at-or-below the
    *     emission frontier only the NEWEST is kept (it is the only one a
    *     future probe can still match — probes below the frontier have
    *     already emitted);
    *   - events later than the watermark (either side) are dropped, the
    *     same contract as Spark's built-in stream-stream joins;
    *   - keys with nothing pending keep their last reference row for
    *     `retention` ms past the frontier, then the state is removed
    *     (EventTimeTimeout) — an idle key costs one buffered row, not
    *     forever-state.
    *
    * StatefulSpec pins multi-batch replay parity against the batch
    * operator (AsOfJoin.backward) on the same rows. The concrete row
    * shapes ([[AsOfEv]]/[[AsOfOut]]) keep the state encoder simple —
    * generalize by swapping the case classes.
    */
  def asOfJoinStream(events: Dataset[AsOfEv], delay: String = "10 minutes",
      retentionMs: Long = 3600000L): Dataset[AsOfOut] = {
    import events.sparkSession.implicits._

    def emit(st: AsOfBufV1, wmUs: Long): (List[AsOfOut], AsOfBufV1) = {
      val (due, pending) = st.lefts.partition(_._1 < wmUs)
      val out = due.map { case (ts, id) =>
        // latest right at-or-before ts; among equal-ts rights the sort
        // makes lastOption the max-id one (q36's max_by tiebreak)
        val m = st.rights.takeWhile(_._1 <= ts).lastOption
        AsOfOut("", ts, id, m.map(_._1), m.map(_._3))
      }
      // frontier = everything below min(pending probe, watermark) is in the
      // past for every FUTURE match; keep only the newest right below it
      val frontier = (pending.headOption.map(_._1).toList :+ wmUs).min
      val (below, above) = st.rights.partition(_._1 <= frontier)
      val kept = below.lastOption.toList ++ above
      (out, AsOfBufV1(1, pending, kept))
    }

    def fn(key: String, it: Iterator[AsOfEv], state: GroupState[AsOfBufV1])
        : Iterator[AsOfOut] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val prev = state.getOption.getOrElse(AsOfBufV1(1, Nil, Nil))
      // NOTE: the engine already drops rows with event time <= the current
      // watermark before fMGWS sees them (so a ts==epoch-0 row can never
      // arrive — the watermark starts at 0); this filter is the same
      // contract applied to whatever does get through.
      val arrivals = it.toSeq.filter(e => micros(e.ts) >= wmUs)
      // buffers are sorted invariants of the state: sort only the ARRIVALS
      // and merge — never re-sort the whole buffer per trigger
      val lefts = mergeSorted(prev.lefts,
        arrivals.filter(_.side == 1).map(e => (micros(e.ts), e.id))
          .sorted.toList)
      val rights = mergeSorted(prev.rights,
        arrivals.filter(_.side == 0).map(e => (micros(e.ts), e.id, e.v))
          .sortBy(r => (r._1, r._2)).toList)(Ordering.by(r => (r._1, r._2)))
      val (out, next) = emit(AsOfBufV1(1, lefts, rights), wmUs)
      if (next.lefts.isEmpty && (next.rights.isEmpty || state.hasTimedOut)) {
        state.remove()
      } else {
        state.update(next)
        // wake (in MS — the engine's timer clock) when the watermark can
        // flush the oldest pending probe, or to expire an idle key's kept
        // reference row
        val wakeMs = next.lefts.headOption.map(_._1 / 1000L + 1)
          .getOrElse(math.max(wmUs, next.rights.map(_._1).max) / 1000L + retentionMs)
        state.setTimeoutTimestamp(math.max(wakeMs, wmUs / 1000L + 1))
      }
      out.map(o => o.copy(key = key)).iterator
    }

    events
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  // ---- streaming clamped running balance (Lindley fold) -----------------

  /** One signed balance movement. */
  final case class BalEv(key: String, ts: java.sql.Timestamp, id: Long,
      delta: Long)

  /** One finalized per-event balance (event time in µs). */
  final case class BalOut(key: String, tsUs: Long, id: Long, bal: Long)

  /** Versioned per-key state: the folded balance so far plus the pending
    * (still inside the watermark window) movements, kept sorted.
    */
  final case class BalStateV1(version: Int, bal: Long,
      buf: List[(Long, Long, Long)]) // (tsUs, id, delta)

  /** STREAMING FLOOR-CLAMPED BALANCE — the stateful twin of q200's batch
    * Lindley windows. The clamped fold B := max(0, B + δ) is
    * ORDER-SENSITIVE and non-commutative, so unlike a windowed sum it
    * cannot tolerate out-of-order application: movements buffer per key
    * until the watermark passes STRICTLY beyond their event time (no
    * earlier on-time movement can still arrive), then fold in (ts, id)
    * order and emit that event's finalized balance. Append-mode output;
    * late rows drop (the stock streaming contract).
    *
    * State per key is the WATERMARK-WINDOW movements plus ONE long — the
    * folded balance. The balance is deliberately kept forever (an account
    * is per-key O(1) resident state, the same footprint as any keyed
    * running aggregate); the buffer drains on every watermark advance, and
    * the arrivals merge into it sorted (mergeSorted — never a full
    * re-sort per trigger). StatefulSpec pins multi-batch replay parity
    * byte-identical to the batch q200 oracle.
    */
  def clampedFoldStream(events: Dataset[BalEv], delay: String = "10 minutes")
      : Dataset[BalOut] = {
    import events.sparkSession.implicits._

    def fn(key: String, it: Iterator[BalEv], state: GroupState[BalStateV1])
        : Iterator[BalOut] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val prev = state.getOption.getOrElse(BalStateV1(1, 0L, Nil))
      val arrivals = it.toSeq.filter(e => micros(e.ts) >= wmUs)
        .map(e => (micros(e.ts), e.id, e.delta)).sortBy(r => (r._1, r._2)).toList
      val buf = mergeSorted(prev.buf, arrivals)(Ordering.by(r => (r._1, r._2)))
      val (due, pending) = buf.partition(_._1 < wmUs)
      var bal = prev.bal
      val out = due.map { case (ts, id, delta) =>
        bal = math.max(0L, bal + delta)
        BalOut(key, ts, id, bal)
      }
      state.update(BalStateV1(1, bal, pending))
      // wake when the watermark can flush the oldest pending movement
      pending.headOption.foreach(p =>
        state.setTimeoutTimestamp(math.max(p._1 / 1000L + 1, wmUs / 1000L + 1)))
      out.iterator
    }

    events
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Column-level wrapper: left (key, ts, id) as-of right (key, ts, v). */
  def asOfEnrichStream(left: DataFrame, right: DataFrame,
      delay: String = "10 minutes"): Dataset[AsOfOut] = {
    import left.sparkSession.implicits._
    val l = left.select(col("key"), col("ts"), lit(1).cast("byte").as("side"),
      col("id"), lit(0.0).as("v"))
    val r = right.select(col("key"), col("ts"), lit(0).cast("byte").as("side"),
      lit(0L).as("id"), col("v"))
    asOfJoinStream(l.unionByName(r).as[AsOfEv], delay)
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
    * bound, stream-stream state grows forever.
    *
    * `joinType` "left_outer" / "right_outer" / "full_outer" additionally
    * emit null-padded rows for the unmatched side(s), but only AFTER the
    * watermark has passed the point where a match could still arrive
    * (Spark's outer-result emission delay — the unmatched verdict is
    * provisional until then, so outer rows trail the inner ones by up to
    * watermark + tolerance; StatefulSpec pins both directions). The output
    * key column coalesces across sides so full_outer's right-only rows
    * keep their key.
    *
    * Input frames must expose (key, ts [timestamp], payload...); the right
    * timestamp is emitted as `r_ts`, right payload columns keep their names
    * (they must not collide with left's).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      tolerance: String = "10 minutes", watermark: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer", "right_outer", "full_outer")(joinType),
      s"intervalJoin supports inner/left_outer/right_outer/full_outer, got '$joinType'")
    val l = left.withWatermark("ts", watermark).alias("l")
    val renamed = right.withColumnRenamed("ts", "r_ts")
    val r = renamed.withWatermark("r_ts", watermark).alias("r")
    val joined = l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.r_ts") >= col("l.ts") - expr(s"INTERVAL $tolerance") &&
        col("r.r_ts") <= col("l.ts"),
      joinType)
    // one surviving key column: for full_outer an unmatched RIGHT row has a
    // null left key, so the output key must coalesce across sides — dropping
    // r.key (the pre-round-6 behavior) would erase the key of exactly the
    // rows the outer mode exists to surface
    val keyOut = joinType match {
      case "right_outer" => col(s"r.$key")
      case "full_outer"  => coalesce(col(s"l.$key"), col(s"r.$key"))
      case _             => col(s"l.$key")
    }
    val lCols = left.columns.filterNot(_ == key).map(c => col(s"l.$c"))
    val rCols = renamed.columns.filterNot(_ == key).map(c => col(s"r.$c"))
    joined.select((keyOut.as(key) +: (lCols ++ rCols)).toIndexedSeq: _*)
  }

  /** Funnel input event (event time in micros; etype: 0=view 1=click
    * 2=purchase).
    */
  final case class FunnelEv(userId: Long, tsUs: Long, etype: Byte)

  /** Versioned per-user funnel state (v1). Only the MIN view time matters
    * (the funnel anchors on the first view), but clicks/purchases must be
    * kept individually: a late-arriving EARLIER view lowers the anchor, and
    * then the first-click-after-view must be re-derived from clicks that
    * were previously at-or-before the old anchor. Lists are kept sorted.
    * `fixedV`/`fixedC`/`fixedP` mark stages the watermark has FROZEN (no
    * on-time event can change them anymore) — pruned mode drops the lists
    * behind each frozen stage.
    */
  final case class FunnelStV1(version: Int, vMinUs: Long,
      clicks: List[Long], purchases: List[Long],
      fixedV: Boolean = false, fixedC: Boolean = false, fixedP: Boolean = false,
      wmAppliedUs: Long = 0L)

  /** Current funnel position of one user (None = stage not reached yet). */
  final case class FunnelRow(userId: Long,
      vTsUs: Option[Long], cTsUs: Option[Long], pTsUs: Option[Long])

  /** Pure per-trigger state transition of the funnel — the STREAMING
    * SEQUENTIAL-CONVERSION FUNNEL (incremental twin of batch q75): per
    * user, the first view, the first click strictly after it, the first
    * purchase strictly after that, correct under arbitrary arrival order
    * because the derived v→c→p chain is recomputed from the kept events
    * whenever the view anchor moves earlier.
    * Folds `arrivals` into `prev`, derives the current v→c→p chain, and —
    * when `wmUs` is given — FREEZES stages the watermark has passed and
    * prunes the state behind them: once wm ≥ v no earlier view can arrive
    * on time, so clicks at-or-before the anchor are dropped; once wm ≥ c
    * (with v frozen) the click list collapses to the single chosen click;
    * once wm ≥ p the purchase list collapses too. A fully frozen chain is
    * THREE LONGS of state per user — the 100 TB steady-state shape.
    */
  private[graft] def funnelAdvance(prev: FunnelStV1, arrivals: Iterator[FunnelEv],
      wmUs: Option[Long]): (FunnelStV1, (Option[Long], Option[Long], Option[Long])) = {
    var vMin = prev.vMinUs
    var clicks = prev.clicks
    var purchases = prev.purchases
    // late-event guard (watermarked mode): drop arrivals at-or-before the
    // watermark that the PREVIOUS advance applied its freeze decisions
    // with (`wmAppliedUs`). This is EXACTLY the engine's own late filter
    // (which uses the previous batch's watermark, not the current one), so
    // nothing the engine admits is lost — and it independently guarantees
    // a frozen stage never sees an older event: every prior freeze
    // threshold is ≤ wmAppliedUs. Arrivals are folded BEFORE this batch's
    // freeze flags are computed, so an event between the previous and
    // current watermark still counts, as in batch semantics.
    val live = wmUs match {
      case Some(_) => arrivals.filter(_.tsUs > prev.wmAppliedUs)
      case None => arrivals
    }
    var newClicks = List.empty[Long]
    var newPurchases = List.empty[Long]
    live.foreach { e =>
      e.etype match {
        case 0 => if (e.tsUs < vMin) vMin = e.tsUs
        case 1 => newClicks = e.tsUs :: newClicks
        case _ => newPurchases = e.tsUs :: newPurchases
      }
    }
    // prev lists are already sorted; pay the sort only on new arrivals
    if (newClicks.nonEmpty) clicks = (clicks ++ newClicks).sorted
    if (newPurchases.nonEmpty) purchases = (purchases ++ newPurchases).sorted
    val vTs = if (vMin == Long.MaxValue) None else Some(vMin)
    val cTs = vTs.flatMap(v => clicks.find(_ > v))
    val pTs = cTs.flatMap(c => purchases.find(_ > c))
    val next = wmUs match {
      case None => FunnelStV1(1, vMin, clicks, purchases)
      case Some(wm) =>
        // freeze uses ≤: an on-time event may still carry ts == wm, but an
        // equal-ts view/click/purchase cannot change a MIN already at wm
        val fV = prev.fixedV || vTs.exists(_ <= wm)
        val fC = prev.fixedC || (fV && cTs.exists(_ <= wm))
        val fP = prev.fixedP || (fC && pTs.exists(_ <= wm))
        // unfrozen stages still prune to the watermark window: a FUTURE
        // anchor (view or click) arrives on time, i.e. at-or-after wm, so
        // an event at-or-before wm can never qualify against it
        val ck = if (fC) cTs.toList
          else if (fV) clicks.filter(_ > vMin)
          else clicks.filter(_ > wm)
        val pu = if (fP) pTs.toList
          else if (fC) purchases.filter(_ > cTs.get)
          else purchases.filter(_ > wm)
        FunnelStV1(1, vMin, ck, pu, fV, fC, fP, math.max(prev.wmAppliedUs, wm))
    }
    (next, (vTs, cTs, pTs))
  }

  /** The next event-time boundary at which the watermark can advance this
    * state's freeze/prune cascade — None when the state is SETTLED (fully
    * frozen, or nothing prunable left). Drives the idle-user timers: a user
    * who stops sending events still gets freeze-advance callbacks until
    * their state reaches its minimal form.
    */
  private[graft] def funnelWakeUs(st: FunnelStV1): Option[Long] = {
    val vTs = if (st.vMinUs == Long.MaxValue) None else Some(st.vMinUs)
    val cTs = vTs.flatMap(v => st.clicks.find(_ > v))
    val pTs = cTs.flatMap(c => st.purchases.find(_ > c))
    if (vTs.isEmpty) (st.clicks ++ st.purchases).minOption
    else if (!st.fixedV) vTs
    else if (!st.fixedC) cTs.orElse(st.purchases.minOption)
    else if (!st.fixedP) pTs
    else None
  }

  /** See [[funnelAdvance]] for the state machine. `watermarkDelay = Some(d)`
    * turns on the production shape: the input gets an event-time watermark;
    * late arrivals are dropped with EXACTLY the engine's contract (at or
    * before the previous advance's watermark — see the guard in
    * funnelAdvance); per-user state is pruned as the watermark freezes each
    * stage; and IDLE users are driven to their minimal state by event-time
    * timers (a churned user's lists still collapse — the state bound does
    * not depend on the user returning). A user whose pruned state is empty
    * is removed entirely; a completed chain keeps its three longs. `None`
    * (the gate's replay mode) keeps every event so parity with the batch
    * oracle is exact under ANY arrival order.
    */
  def funnelStream(events: Dataset[FunnelEv],
      watermarkDelay: Option[String] = None): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._

    val src = watermarkDelay match {
      case Some(d) => events.toDF()
        .withColumn("_ts", timestamp_micros(col("tsUs")))
        .withWatermark("_ts", d)
        .as[FunnelEv](org.apache.spark.sql.Encoders.product[FunnelEv])
      case None => events
    }

    def fn(userId: Long, it: Iterator[FunnelEv],
        state: GroupState[FunnelStV1]): FunnelRow = {
      val prev = state.getOption.getOrElse(FunnelStV1(1, Long.MaxValue, Nil, Nil))
      val wm = watermarkDelay.map(_ => state.getCurrentWatermarkMs() * 1000L)
      val (next, (vTs, cTs, pTs)) = funnelAdvance(prev, it, wm)
      if (wm.isDefined && next.vMinUs == Long.MaxValue &&
          next.clicks.isEmpty && next.purchases.isEmpty) {
        // nothing survived pruning and no anchor: indistinguishable from a
        // brand-new user, so drop the state entirely
        state.remove()
      } else {
        state.update(next)
        // idle-user drive (watermarked mode): while the state is not yet
        // minimal, arm an event-time timer at the next freeze/prune
        // boundary so the cascade advances even if the user never returns
        if (wm.isDefined) funnelWakeUs(next).foreach { wakeUs =>
          state.setTimeoutTimestamp(
            math.max(wakeUs / 1000L + 1, wm.get / 1000L + 1))
        }
      }
      FunnelRow(userId, vTs, cTs, pTs)
    }

    // EventTimeTimeout in watermarked mode does double duty: it switches ON
    // the exec's late-row filter (applied only under this conf, with the
    // previous batch's watermark — funnelAdvance's guard mirrors the same
    // clock), and it delivers the idle-user freeze-advance timers set
    // above (a timed-out key re-enters fn with an empty iterator).
    val timeout =
      if (watermarkDelay.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src
      .groupByKey(_.userId)
      .mapGroupsWithState(timeout)(fn)
  }
}
