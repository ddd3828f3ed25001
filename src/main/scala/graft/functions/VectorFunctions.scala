package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(DoubleType)` columns, built from Spark's
  * codegen'd higher-order functions (`zip_with` + `aggregate`) so the whole
  * computation stays inside whole-stage codegen — no UDF, no serialization.
  *
  * The accumulation is a sequential left fold, which makes the result
  * deterministic and bit-identical to any other engine folding the same
  * doubles in order (DuckDB's list_* functions included, modulo the final
  * 1-ulp formula differences that the 6-dp output rounding absorbs).
  *
  * A custom Catalyst Expression variant (SURVEY §7.3.1) can replace these
  * bodies without touching call sites.
  */
object VectorFunctions {

  /** Elementwise product folded into a double sum: dot(a, b). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity dot/(|a|·|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
