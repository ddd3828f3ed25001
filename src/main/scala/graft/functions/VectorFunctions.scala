package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(DoubleType)` columns.
  *
  * `cosine` dispatches to the custom codegen'd Catalyst expression
  * (CosineSimilarity, SURVEY §7.3.1): a single fused primitive loop inside
  * whole-stage codegen. The higher-order-function formulations are kept as
  * `dotHof`/`cosineHof` — Spark evaluates HOF lambdas interpreted (one
  * closure call per element per row), which measured ~5× slower on the
  * brute-force ANN sweep; they remain as the pure-SQL fallback and as the
  * cross-check for the custom expression.
  *
  * Both paths accumulate as a sequential left fold, so results are
  * deterministic and agree with DuckDB's list_cosine_similarity modulo
  * final-ulp formula differences absorbed by the protocol's 6-dp rounding.
  */
object VectorFunctions {

  /** Codegen'd cosine similarity (custom Catalyst expression). Inputs are
    * coerced to array<double>, so float-typed embedding columns work as-is.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.GraftExtensions.binary("cosine_similarity", CosineSimilarity)(Seq(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b))))

  /** Codegen'd dot product (custom Catalyst expression), same coercion. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.GraftExtensions.binary("dot_product", DotProduct)(Seq(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b))))

  /** HOF fallback: elementwise product folded into a double sum. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** HOF fallback cosine, dot/(|a|·|b|). */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Register `cosine_similarity` / `dot_product` for SQL use on this
    * session (GraftExtensions does the same via spark.sql.extensions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", graft.GraftExtensions.binary("cosine_similarity", CosineSimilarity), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", graft.GraftExtensions.binary("dot_product", DotProduct), "scala_udf")
  }
}
