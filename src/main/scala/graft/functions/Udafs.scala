package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** UDF/UDAF surface (SURVEY §2.2 "UDF surface"): typed `Aggregator`s — the
  * engine-API way to add aggregation semantics Spark lacks. Registered via
  * `functions.udaf(...)`; partial aggregation (merge) works across
  * partitions, so these scale like built-ins.
  */
object Udafs {

  /** Weighted mean: Σ(w·x)/Σ(w). The OHLC "VWAP" of the reference's domain
    * (price weighted by quantity).
    */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** A running OHLC bar as a typed aggregate: (open@minTs, high, low,
    * close@maxTs, volume, count) — the batch twin of Stateful.runningOhlc.
    * Input: (tsMicros, price, qty).
    */
  final case class OhlcBuf(
      minTs: Long, maxTs: Long, open: Double, high: Double,
      low: Double, close: Double, volume: Double, count: Long)

  object Ohlc extends Aggregator[(Long, Double, Double), OhlcBuf, OhlcBuf] {
    override def zero: OhlcBuf =
      OhlcBuf(Long.MaxValue, Long.MinValue, 0, Double.MinValue, Double.MaxValue, 0, 0, 0)
    override def reduce(b: OhlcBuf, a: (Long, Double, Double)): OhlcBuf = {
      val (ts, p, q) = a
      OhlcBuf(
        minTs = math.min(b.minTs, ts), maxTs = math.max(b.maxTs, ts),
        open = if (ts < b.minTs) p else b.open,
        high = math.max(b.high, p), low = math.min(b.low, p),
        close = if (ts > b.maxTs) p else b.close,
        volume = b.volume + q, count = b.count + 1)
    }
    override def merge(x: OhlcBuf, y: OhlcBuf): OhlcBuf = {
      if (y.count == 0) x
      else if (x.count == 0) y
      else OhlcBuf(
        minTs = math.min(x.minTs, y.minTs), maxTs = math.max(x.maxTs, y.maxTs),
        open = if (x.minTs <= y.minTs) x.open else y.open,
        high = math.max(x.high, y.high), low = math.min(x.low, y.low),
        close = if (x.maxTs >= y.maxTs) x.close else y.close,
        volume = x.volume + y.volume, count = x.count + y.count)
    }
    override def finish(r: OhlcBuf): OhlcBuf = r
    override def bufferEncoder: Encoder[OhlcBuf] = Encoders.product[OhlcBuf]
    override def outputEncoder: Encoder[OhlcBuf] = Encoders.product[OhlcBuf]
  }

  /** Exact (decimal) weighted-sum parts: Σ(w·x) and Σ(w) as BigDecimal, so
    * the aggregation is order-insensitive and can sit under the DuckDB
    * hash gate (q88) — the double-buffered [[WeightedMean]] cannot (float
    * addition order varies with partitioning). The caller divides and
    * rounds per the determinism protocol; emitting the parts rather than
    * the quotient keeps the one inexact step (division) in the same place
    * every other gated query puts it.
    */
  final case class WSumParts(sum_wx: java.math.BigDecimal, sum_w: java.math.BigDecimal)

  object DecimalWeightedSum extends Aggregator[
      (java.math.BigDecimal, java.math.BigDecimal), WSumParts, WSumParts] {
    private val Z = java.math.BigDecimal.ZERO
    override def zero: WSumParts = WSumParts(Z, Z)
    override def reduce(b: WSumParts, a: (java.math.BigDecimal, java.math.BigDecimal)): WSumParts =
      if (a._1 == null || a._2 == null) b // SQL semantics: NULL rows don't contribute
      else WSumParts(b.sum_wx.add(a._1.multiply(a._2)), b.sum_w.add(a._2))
    override def merge(x: WSumParts, y: WSumParts): WSumParts =
      WSumParts(x.sum_wx.add(y.sum_wx), x.sum_w.add(y.sum_w))
    override def finish(r: WSumParts): WSumParts = r
    override def bufferEncoder: Encoder[WSumParts] = Encoders.product[WSumParts]
    override def outputEncoder: Encoder[WSumParts] = Encoders.product[WSumParts]
  }

  /** Bounded grouped top-k as an AGGREGATE — the aggregation alternative to
    * window ranking. A window top-k sorts every group in full; this buffer
    * never holds more than k rows, the map-side partial combines locally,
    * and the shuffle carries ≤ k rows PER PARTITION per group — at 100 TB
    * with millions of rows per group and k=3, that is the difference
    * between shuffling the table and shuffling k·P counter rows.
    *
    * Ordering is the total (score DESC, k1 ASC, k2 ASC), so equal scores
    * resolve deterministically and the result is bit-identical to the
    * ROW_NUMBER formulation on any partitioning. Buffer arrays stay in
    * Tungsten rows (Encoders.product with Array fields) — no Kryo opacity.
    */
  final case class TopKBuf(score: Array[Double], k1: Array[Long], k2: Array[Long])

  final class BoundedTopK(k: Int)
      extends Aggregator[(Double, Long, Long), TopKBuf, TopKBuf] {
    require(k > 0, s"BoundedTopK needs k > 0, got $k")
    private def beats(p: Double, a: Long, b: Long, buf: TopKBuf, i: Int): Boolean = {
      val c = java.lang.Double.compare(p, buf.score(i))
      c > 0 || (c == 0 && (a < buf.k1(i) || (a == buf.k1(i) && b < buf.k2(i))))
    }
    private def insert(buf: TopKBuf, p: Double, a: Long, b: Long): TopKBuf = {
      val n = buf.score.length
      if (n == k && !beats(p, a, b, buf, n - 1)) return buf
      var pos = 0
      while (pos < n && !beats(p, a, b, buf, pos)) pos += 1
      val m = math.min(n + 1, k)
      val (ps, as_, bs) = (new Array[Double](m), new Array[Long](m), new Array[Long](m))
      var i = 0
      while (i < m) {
        if (i < pos) { ps(i) = buf.score(i); as_(i) = buf.k1(i); bs(i) = buf.k2(i) }
        else if (i == pos) { ps(i) = p; as_(i) = a; bs(i) = b }
        else { ps(i) = buf.score(i - 1); as_(i) = buf.k1(i - 1); bs(i) = buf.k2(i - 1) }
        i += 1
      }
      TopKBuf(ps, as_, bs)
    }
    override def zero: TopKBuf =
      TopKBuf(Array.empty[Double], Array.empty[Long], Array.empty[Long])
    override def reduce(b: TopKBuf, a: (Double, Long, Long)): TopKBuf =
      insert(b, a._1, a._2, a._3)
    override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
      var acc = x; var i = 0
      while (i < y.score.length) { acc = insert(acc, y.score(i), y.k1(i), y.k2(i)); i += 1 }
      acc
    }
    override def finish(r: TopKBuf): TopKBuf = r
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Misra-Gries heavy-hitter candidate buffer: parallel key/count arrays,
    * ≤ k-1 live entries (kept sorted by key for deterministic encoding).
    */
  final case class MgBuf(keys: Array[String], counts: Array[Long])

  /** MISRA-GRIES heavy-hitter SUMMARY (Misra & Gries '82; mergeable form
    * per Agarwal et al., "Mergeable Summaries", PODS'12): a ≤(k-1)-entry
    * candidate set guaranteed to contain EVERY item with true frequency
    * > n/k, maintained with map-side partial aggregation — the candidate
    * pruning that lets a heavy-hitter query shuffle ≤(k-1) keys per
    * partition instead of the full distinct-key set.
    *
    * reduce: increment a present key; insert while < k-1 entries; else
    * decrement ALL entries (dropping zeros) — the classic counter trade.
    * merge: sum counters pairwise, then if > k-1 entries survive, subtract
    * the k-th largest count from every entry and drop non-positives. Both
    * preserve the deficit bound (true_count - count̂ ≤ n/k), so the
    * guarantee holds across ANY partitioning/merge order.
    *
    * The candidates are order-dependent (different merges keep different
    * sub-threshold keys) — so a DETERMINISTIC query must verify candidates
    * against exact counts (q162 does; its final output is merge-order-free).
    */
  final class MisraGries(k: Int) extends Aggregator[String, MgBuf, MgBuf] {
    require(k >= 2, s"MisraGries needs k >= 2, got $k")

    private def toMap(b: MgBuf): scala.collection.mutable.LinkedHashMap[String, Long] = {
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      var i = 0
      while (i < b.keys.length) { m.update(b.keys(i), b.counts(i)); i += 1 }
      m
    }
    private def toBuf(m: scala.collection.mutable.LinkedHashMap[String, Long]): MgBuf = {
      val sorted = m.toArray.sortBy(_._1)
      MgBuf(sorted.map(_._1), sorted.map(_._2))
    }

    override def zero: MgBuf = MgBuf(Array.empty, Array.empty)

    override def reduce(b: MgBuf, key: String): MgBuf = {
      val m = toMap(b)
      if (m.contains(key)) m.update(key, m(key) + 1L)
      else if (m.size < k - 1) m.update(key, 1L)
      else {
        val dead = m.iterator.filter(_._2 == 1L).map(_._1).toList
        m.mapValuesInPlace((_, c) => c - 1L)
        dead.foreach(m.remove)
      }
      toBuf(m)
    }

    override def merge(x: MgBuf, y: MgBuf): MgBuf = {
      val m = toMap(x)
      var i = 0
      while (i < y.keys.length) {
        m.update(y.keys(i), m.getOrElse(y.keys(i), 0L) + y.counts(i)); i += 1
      }
      if (m.size > k - 1) {
        val kth = m.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
        val dead = m.iterator.filter(_._2 <= kth).map(_._1).toList
        m.mapValuesInPlace((_, c) => c - kth)
        dead.foreach(m.remove)
      }
      toBuf(m)
    }

    override def finish(r: MgBuf): MgBuf = r
    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  }

  /** Register the UDAFs (and a sample scalar UDF) on a session for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("weighted_mean", org.apache.spark.sql.functions.udaf(WeightedMean))
    spark.udf.register("weighted_sum_parts", org.apache.spark.sql.functions.udaf(
      DecimalWeightedSum, Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)))
    // scalar UDF example — the API exists; hot paths should use codegen'd
    // expressions (CosineSimilarity) instead, per SURVEY §2.2.
    spark.udf.register("clip01", (x: Double) => math.max(0.0, math.min(1.0, x)))
  }
}
