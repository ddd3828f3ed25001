package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized parity law for operators.IncrementalJoinView (q170): across
  * arbitrary batchings of BOTH join sides — different batch counts, uneven
  * splits, rows of the two sides arriving in different batches — the
  * maintained view must equal the one-shot join, row for row.
  */
class IvmSpec extends AnyFunSuite {
  import TestSpark._

  test("delta-rule view equals one-shot join under randomized batching") {
    val orders = graft.model.Tables.load(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("custkey"))
    val cust = graft.model.Tables.load(spark, sf0001, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val expected = orders.join(cust, Seq("custkey"))
      .collect().map(_.toString).sorted.toSeq

    for (trial <- 1 to 3) {
      val k = 2 + trial // 3, 4, 5 batches
      val base = tmpDir(s"ivm$trial")
      val st = graft.operators.IncrementalJoinView.State(
        s"$base/a", s"$base/b", s"$base/v")
      // independent per-side batch assignment: a pair's two rows usually
      // arrive in DIFFERENT batches, exercising all three delta terms
      (0 until k).foreach { i =>
        graft.operators.IncrementalJoinView.applyDelta(spark, st,
          orders.where(pmod(xxhash64(col("o_orderkey") + lit(trial)), lit(k)) === i),
          cust.where(pmod(xxhash64(col("custkey") * lit(31) + lit(trial)), lit(k)) === i),
          Seq("custkey"))
      }
      val proto = orders.join(cust, Seq("custkey")).limit(0)
      val got = graft.operators.IncrementalJoinView.view(spark, st, proto)
        .collect().map(_.toString).sorted.toSeq
      assert(got == expected, s"trial $trial (k=$k): view diverged from one-shot join")
    }
  }
}
