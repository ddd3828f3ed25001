package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Protocol

/** Terminal-range guard for the DOUBLE protocol (Protocol.finalizeDoubles):
  * above 2^53·10⁻⁶ two 6-dp decimals differing in the last digit collapse
  * to ONE float64, so a real divergence could hash-MATCH the oracle — the
  * one failure mode the gate cannot see, because both engines cast
  * identically. The guard must turn that silent exactness cap into a loud
  * runtime failure.
  */
class ProtocolGuardSpec extends AnyFunSuite {
  import TestSpark._

  private def asDec(vs: Double*) = {
    import spark.implicits._
    vs.toDF("x").select(Protocol.out6(org.apache.spark.sql.functions.col("x")).as("x"))
  }

  test("in-range terminal decimals pass through as exact doubles") {
    val got = Protocol.finalizeDoubles(asDec(0.000001, 123456.789012, 8.9e9, -8.9e9))
      .collect().map(_.getDouble(0)).toSet
    assert(got == Set(0.000001, 123456.789012, 8.9e9, -8.9e9))
    assert(Protocol.finalizeDoubles(asDec(Double.NaN).selectExpr("CAST(NULL AS DECIMAL(18,6)) AS x"))
      .collect()(0).isNullAt(0)) // NULLs survive the guard branch
  }

  test("a >2^53*1e-6 terminal decimal fails loudly instead of hash-matching wrong") {
    val e = intercept[Exception] {
      Protocol.finalizeDoubles(asDec(9.1e9)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exactness bound")),
      s"expected the terminal-range guard message, got: ${msgs(e).mkString(" | ")}")
    // negative side of the bound trips too
    intercept[Exception] { Protocol.finalizeDoubles(asDec(-9.1e9)).collect() }
  }
}
