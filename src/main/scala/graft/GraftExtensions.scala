package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, JaroWinklerSimilarity, ShingleArray, ShingleExplode}

/** Session extensions: install with
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * to get the custom SQL functions on every session of a cluster — the
  * deployment path for the engine's Catalyst additions (SURVEY §7.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      GraftExtensions.binary("cosine_similarity", CosineSimilarity)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      GraftExtensions.binary("dot_product", DotProduct)))
    // optimizer: HOF dot-product idiom -> codegen'd DotProduct
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    // governance: opt-in fail-fast on partition-less windows (scale guard)
    ext.injectOptimizerRule(_ => graft.plans.PartitionlessWindowGuard)
    // planner: native as-of join (AsOfJoinPlan -> AsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "jaro_winkler"),
      {
        case Seq(a, b) => JaroWinklerSimilarity(a, b)
        case other => throw new IllegalArgumentException(
          s"jaro_winkler requires exactly 2 arguments, got ${other.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_array"),
      new ExpressionInfo(classOf[ShingleArray].getName, "shingle_array"),
      {
        case Seq(t) => ShingleArray(t, distinct = false)
        case Seq(t, d: org.apache.spark.sql.catalyst.expressions.Literal) =>
          ShingleArray(t, distinct = d.value == true)
        case other => throw new IllegalArgumentException(
          s"shingle_array requires (text[, distinct]), got ${other.size} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("explode_shingles"),
      new ExpressionInfo(classOf[ShingleExplode].getName, "explode_shingles"),
      {
        case Seq(t, n) => ShingleExplode(t, n)
        case other => throw new IllegalArgumentException(
          s"explode_shingles requires exactly 2 arguments, got ${other.size}")
      }))
  }
}

object GraftExtensions {
  /** Arity-checked builder with array<double> coercion: the expressions
    * assume double-backed arrays, but SQL callers naturally pass e.g. the
    * fixtures' native array<float> embedding column — reading a float-backed
    * ArrayData as doubles would corrupt values, so coerce here.
    */
  def binary(name: String, f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => f(toDoubleArray(a), toDoubleArray(b))
    case other => throw new IllegalArgumentException(
      s"$name requires exactly 2 arguments, got ${other.size}")
  }

  private def toDoubleArray(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
}
