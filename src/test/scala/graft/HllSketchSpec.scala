package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4 DataSketches HLL surface — the MERGEABLE distinct-count sketch a
  * 100 TB rollup store keeps per partition/day so any ad-hoc slice can be
  * union-merged without rescanning facts (the q39 approx_count_distinct is
  * one-shot; sketches make the partial states first-class columns).
  * Engine-only component (DuckDB's approx sketch is a different algorithm,
  * so there is no oracle hash to match — the laws below are the gate).
  */
class HllSketchSpec extends AnyFunSuite {
  import TestSpark._

  test("per-day HLL sketches union-merge to the whole-stream estimate within rank error") {
    val ev = graft.model.Tables.load(spark, sf0001, "events")
    val exact = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)

    // one sketch per day, persisted as a binary column (the rollup-store shape)
    val daily = ev
      .groupBy(to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    // any slice = union of its days' sketches, never a fact rescan
    val merged = daily.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val direct = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect()(0).getLong(0)

    // lgK=12 default -> relative standard error ~1.6%; allow 5% plus the
    // ±1 integer rounding floor for tiny cardinalities
    def close(a: Long, b: Long): Boolean = math.abs(a - b) <= math.max(1L, b / 20)
    assert(close(direct, exact), s"direct estimate $direct vs exact $exact")
    assert(close(merged, exact), s"merged estimate $merged vs exact $exact")
  }

  test("sketch column round-trips through parquet and keeps merging") {
    val dir = tmpDir("hll")
    val ev = graft.model.Tables.load(spark, sf0001, "events")
    ev.groupBy(to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .write.mode("overwrite").parquet(s"$dir/sketches")
    val re = spark.read.parquet(s"$dir/sketches")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .collect()(0).getLong(0)
    val exact = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(re - exact) <= math.max(1L, exact / 20),
      s"persisted-sketch estimate $re vs exact $exact")
  }
}
