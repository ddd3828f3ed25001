package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the q175-q184 statistics family — pins the
  * SEMANTICS (boundary rules, tie-breaks, horizon edges, dense grids)
  * independently of the DuckDB oracle gate.
  */
class StatSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  /** Mini events table in the fixture column order. */
  private def writeEvents(dir: String, rows: Seq[(Long, Long, Long, String, Double)]): Unit =
    rows.map { case (id, sec, uid, et, v) => (id, ts(sec), uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q175 drawdown: peak-to-trough with earliest-trough tie-break") {
    val dir = tmpDir("statdd")
    // values 10, 8, 12, 5, 9 -> running peak 10,10,12,12,12; dd 0,2,0,7,3
    writeEvents(dir, Seq(
      (1L, 1L, 0L, "view", 10.0), (2L, 2L, 0L, "view", 8.0),
      (3L, 3L, 0L, "view", 12.0), (4L, 4L, 0L, "view", 5.0),
      (5L, 5L, 0L, "view", 9.0)))
    val r = SparkEntry.queries("q175_max_drawdown")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("max_dd_micro") == 7000000L)
    assert(row.getAs[Long]("peak_micro") == 12000000L)
    assert(row.getAs[Long]("trough_micro") == 5000000L)
    assert(row.getAs[Long]("trough_us") == 4000000L)
  }

  test("q179 ABC: inclusive boundary lands exactly-70% in A, exactly-90% in B") {
    val dir = tmpDir("statabc")
    // three parts, one line each: revenues 70, 20, 10 (discount 0)
    val li = Seq((1L, 1L, 70.0), (2L, 2L, 20.0), (3L, 3L, 10.0))
      .map { case (ok, pk, p) =>
        (ok, pk, 1L, 1, 1.0, p, 0.0, 0.0, "N", "O", ts(1000))
      }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q179_abc_class")(spark, dir)
      .collect().map(x => x.getAs[String]("cls") ->
        (x.getAs[Long]("n_parts"), x.getAs[Long]("share_ppm"))).toMap
    assert(r("A") == (1L, 700000L)) // cum 70/100 <= 70% inclusive -> A
    assert(r("B") == (1L, 200000L)) // cum 90/100 <= 90% inclusive -> B
    assert(r("C") == (1L, 100000L))
  }

  test("q178 KS: cross-multiplied ECDF gap with earliest-value tie-break") {
    val dir = tmpDir("statks")
    // urgent totals {1, 2}, other totals {1, 3}:
    // cents 100:|1*2-1*2|=0, 200:|2*2-1*2|=2, 300:|2*2-2*2|=0 -> D=2/4
    val o = Seq((1L, "1-URGENT", 1.0), (2L, "1-URGENT", 2.0),
      (3L, "3-MEDIUM", 1.0), (4L, "3-MEDIUM", 3.0))
      .map { case (k, pr, tp) => (k, 1L, "O", tp, ts(1000), pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    o.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q178_ks_test")(spark, dir).collect().head
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("ks_ppm") == 500000L)
    assert(r.getAs[Long]("ks_at_cent") == 200L)
  }

  test("q181 attribution: 7-day horizon is inclusive; latest channel wins") {
    val day = 86400L
    val dir = tmpDir("statattr")
    writeEvents(dir, Seq(
      // u1: click at t=0, purchase at exactly +7d -> attributed to click
      (1L, 0L, 1L, "click", 1.0), (2L, 7 * day, 1L, "purchase", 10.0),
      // u2: view at t=0, purchase at +7d+1s -> outside horizon -> none
      (3L, 0L, 2L, "view", 1.0), (4L, 7 * day + 1, 2L, "purchase", 20.0),
      // u3: view then click then purchase -> LAST touch (click) wins;
      // an interleaved purchase does not reset the channel
      (5L, 10L, 3L, "view", 1.0), (6L, 20L, 3L, "purchase", 5.0),
      (7L, 30L, 3L, "click", 1.0), (8L, 40L, 3L, "purchase", 40.0)))
    val r = SparkEntry.queries("q181_last_touch")(spark, dir)
      .collect().map(x => x.getAs[String]("channel") ->
        (x.getAs[Long]("n_purchases"), x.getAs[Long]("attr_value_micro"))).toMap
    assert(r("click") == (2L, 50000000L)) // u1's 10 + u3's 40
    assert(r("none") == (1L, 20000000L))  // u2 outside horizon
    assert(r("view") == (1L, 5000000L))   // u3's first purchase, last touch = view
  }

  test("q184 survival: dense grid covers gap days; exact hazard/survival ppm") {
    val day = 86400L
    val dir = tmpDir("statsurv")
    // spans: u1 -> 0, u2 -> 0, u3 -> 2 (gap at k=1 must still appear)
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 0L, 2L, "view", 1.0),
      (3L, 0L, 3L, "view", 1.0), (4L, 2 * day, 3L, "view", 1.0)))
    val rows = SparkEntry.queries("q184_survival")(spark, dir)
      .collect().map(x => (x.getAs[Long]("k"), x.getAs[Long]("at_risk"),
        x.getAs[Long]("deaths"), x.getAs[Long]("hazard_ppm"), x.getAs[Long]("surv_ppm")))
    assert(rows.toSeq == Seq(
      (0L, 3L, 2L, 666666L, 1000000L),
      (1L, 1L, 0L, 0L, 333333L),
      (2L, 1L, 1L, 1000000L, 333333L)))
  }

  test("q176 autocorr: alternating series has negative sign, near-max r^2") {
    val day = 86400L
    val dir = tmpDir("statacf")
    // daily totals alternate 10,2,10,2,10 (whole units) -> strong negative
    // lag-1 autocorrelation; n=4 pairs (x,y): (10,2),(2,10),(10,2),(2,10)
    // sx=24 sy=24 sxx=208 syy=208 sxy=4*20=80 -> num=4*80-576=-256
    // den=4*208-576=256 -> r=-1 exactly -> signed r2_ppm = -1000000
    writeEvents(dir, (0 until 5).map(i =>
      (i + 1L, i * day, 0L, "view", if (i % 2 == 0) 10.0 else 2.0)))
    val r = SparkEntry.queries("q176_autocorr")(spark, dir).collect().head
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Long]("acf1_r2_ppm") == -1000000L)
  }

  test("q216 Mann-Whitney: hand tape with a tie -> U1 = 2, AUC = 0.5 exactly") {
    val dir = tmpDir("statmw")
    // purchase {3, 1}, view {2, 2}: pooled doubled midranks 2,5,5,8;
    // 2*SumR1 = 2+8 = 10; 2*U1 = 10 - 2*3 = 4 (U1 = 2: the 3 beats both 2s)
    writeEvents(dir, Seq(
      (1L, 1L, 0L, "purchase", 3.0), (2L, 2L, 0L, "purchase", 1.0),
      (3L, 3L, 0L, "view", 2.0), (4L, 4L, 0L, "view", 2.0)))
    val r = SparkEntry.queries("q216_mann_whitney")(spark, dir).collect().head
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("u_doubled") == 4L)
    assert(r.getAs[Long]("auc_ppm") == 500000L)
  }

  test("q217 Spearman: perfectly anti-monotone daily series -> rho = -1e6 exactly") {
    val dir = tmpDir("statsp")
    val day = 86400L
    // 3 days: purchase totals rise 1,2,3 while view totals fall 3,2,1
    writeEvents(dir, Seq(
      (1L, 0 * day, 0L, "purchase", 1.0), (2L, 0 * day, 0L, "view", 3.0),
      (3L, 1 * day, 0L, "purchase", 2.0), (4L, 1 * day, 0L, "view", 2.0),
      (5L, 2 * day, 0L, "purchase", 3.0), (6L, 2 * day, 0L, "view", 1.0)))
    val r = SparkEntry.queries("q217_spearman")(spark, dir).collect().head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("rho_ppm") == -1000000L)
    // Kendall agrees on the extreme: all 3 pairs discordant -> tau = -1e6
    val k = SparkEntry.queries("q218_kendall")(spark, dir).collect().head
    assert(k.getAs[Long]("n_pairs") == 3L)
    assert(k.getAs[Long]("c_minus_d") == -3L)
    assert(k.getAs[Long]("tau_ppm") == -1000000L)
  }

  test("q219 permutation test: constant-sign diffs are extreme; p respects add-one bound") {
    val dir = tmpDir("statpt")
    val day = 86400L
    // purchase >> view every day -> observed |T| is the max over all sign
    // flips, so every resample has T_r <= T_obs, and T_r = T_obs only when
    // all 5 md5 bits agree; p_ppm is small but NEVER below the 1/201 floor
    writeEvents(dir, (0 until 5).flatMap(i => Seq(
      (2L * i + 1, i * day, 0L, "purchase", 100.0 + i),
      (2L * i + 2, i * day, 0L, "view", 1.0))))
    val r = SparkEntry.queries("q219_perm_test")(spark, dir).collect().head
    assert(r.getAs[Long]("n_days") == 5L)
    val p = r.getAs[Long]("p_ppm")
    assert(p >= 1000000L / 201L && p <= 1000000L, s"p out of range: $p")
    // determinism: the md5-derived p-value is a pure function of the data
    val r2 = SparkEntry.queries("q219_perm_test")(spark, dir).collect().head
    assert(r2.getAs[Long]("p_ppm") == p && r2.getAs[Long]("n_ge") == r.getAs[Long]("n_ge"))
  }
}
