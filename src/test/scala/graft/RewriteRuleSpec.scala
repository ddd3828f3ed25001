package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** The RewriteHofDotProduct optimizer rule — GraftExtensions is installed on
  * the shared test session (TestSpark), matching how a cluster deploys it.
  * Inputs come from parquet (not literals): literal-backed plans constant-
  * fold into a LocalRelation before anything is observable.
  */
class RewriteRuleSpec extends AnyFunSuite {

  private lazy val sp: SparkSession = TestSpark.spark

  private def emb: DataFrame =
    sp.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  test("HOF dot-product idiom is rewritten to the codegen expression") {
    val df = emb.as("a").join(emb.as("b"), col("a.vec_id") === col("b.vec_id"))
      .select(VectorFunctions.dotHof(col("a.e"), col("b.e")).as("d"), col("a.vec_id"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
    // and the rewritten plan computes the same values as the expression API
    val viaExpr = emb.select(col("vec_id"),
      VectorFunctions.dot(col("e"), col("e")).as("d"))
    val viaHof = emb.select(col("vec_id"),
      VectorFunctions.dotHof(col("e"), col("e")).as("d"))
    assert(viaHof.exceptAll(viaExpr).count() == 0)
  }

  test("cosineHof collapses to dot_products with identical values") {
    val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
    val hof = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), VectorFunctions.cosineHof(col("e"), col("qe")).as("c"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("dot_product"))
    val expr = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), VectorFunctions.cosine(col("e"), col("qe")).as("c"))
    assert(hof.exceptAll(expr).count() == 0)
  }

  test("ragged arrays: rewritten plan preserves the HOF's NULL semantics") {
    val ragged = emb.select(col("vec_id"), col("e"),
      when(col("vec_id") % 2 === 0, slice(col("e"), 1, 32)).otherwise(col("e")).as("e2"))
      .select(col("vec_id"), VectorFunctions.dotHof(col("e"), col("e2")).as("d"))
    assert(ragged.queryExecution.optimizedPlan.toString.contains("dot_product"))
    val rows = ragged.collect()
    // even vec_ids compare a 64-dim against a 32-dim slice -> NULL, odd -> value
    assert(rows.forall(r => (r.getLong(0) % 2 == 0) == r.isNullAt(1)))
  }

  test("a non-matching aggregate (different zero) is left untouched") {
    val df = emb.select(
      aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
        lit(1.0d), (acc, x) => acc + x).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("dot_product"))
    assert(df.count() == 500)
  }
}
