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

  /** Symmetric int8 quantization of an embedding: per-vector scale
    * `s = max|e|/127`, stored as (scale, array<tinyint>) — 1 byte per
    * dimension instead of 8 (or 4 for float), the standard 4-8× memory cut
    * for ANN candidate sets. HOF evaluation is fine HERE because
    * quantization is one-time preprocessing, not a per-query hot path
    * (the hot path compares already-quantized vectors).
    */
  def quantizeInt8(e: Column): Column = {
    // floor on the scale keeps a zero vector from dividing by zero (its
    // quantized form is all-zeros either way)
    val scale = greatest(
      aggregate(e, lit(0.0d), (m, x) => greatest(m, abs(x))) / 127.0d,
      lit(java.lang.Double.MIN_NORMAL))
    struct(
      scale.as("scale"),
      transform(e, x => round(x / scale).cast("tinyint")).as("q"))
  }

  /** Dequantize back to array<double>: q_i · scale. Cosine over the
    * dequantized vectors approximates the exact cosine to ~1e-2 at dim 64
    * (pinned in ScaleOpsSpec with recall on brute-force top-k).
    */
  def dequantizeInt8(qe: Column): Column =
    transform(qe.getField("q"), x => x.cast("double") * qe.getField("scale"))

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
