package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q238's tie-safe rank-window logic: the GK estimate's rank INTERVAL
  * [count(<v), count(<=v)] must intersect the ±1% window even when the
  * distribution is one giant tie — the case where any single-rank check
  * (count(<=v) alone) would false-alarm.
  */
class ApproxPercentileAuditSpec extends AnyFunSuite {
  import TestSpark._

  private def audit(df: org.apache.spark.sql.DataFrame) = {
    val est = df.agg(expr("approx_percentile(x, 0.5D, 100)").as("apx"))
    df.crossJoin(broadcast(est))
      .agg(count(lit(1)).as("n"),
        sum(when(col("x") < col("apx"), 1L).otherwise(0L)).as("r_lt"),
        sum(when(col("x") <= col("apx"), 1L).otherwise(0L)).as("r_le"))
      .select(
        (col("r_lt") <= (lit(51L) * col("n") + 99L).divide(100L).cast("long") + 1L &&
          col("r_le") >= greatest((lit(49L) * col("n")).divide(100L).cast("long") - 1L, lit(0L)))
          .as("within"))
      .collect().head.getBoolean(0)
  }

  test("bound holds on a smooth distribution") {
    import spark.implicits._
    assert(audit((1 to 10000).map(_.toDouble).toDF("x")))
  }

  test("bound holds when 90% of the column is one tied value") {
    import spark.implicits._
    // median value 5.0 has rank interval [500, 9500] — the single-rank
    // check count(<=v)=9500 > 5100 would false-alarm; the interval check
    // correctly intersects the window
    val xs = Seq.fill(9000)(5.0) ++ (1 to 1000).map(_ / 1000.0)
    assert(audit(xs.toDF("x")))
  }
}
