package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro-Winkler similarity — the fuzzy-match metric Spark lacks
  * (it ships only `levenshtein`). Used as the cheap-sketch-verifies-pair
  * step of the dedup family (q118): Jaro-Winkler is O(len·window) per pair
  * vs levenshtein's O(len²), and weighs shared prefixes — the right shape
  * for near-duplicate web text that diverges at the tail (boilerplate
  * suffixes, trailing edits).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` so the oracle can
  * check it bit-for-bit (probed empirically, DuckDB 1.x):
  *   - match window = max(0, ⌊max(|a|,|b|)/2⌋ − 1); transpositions are
  *     half the out-of-order matches (floor);
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, 0 when m = 0;
  *   - Winkler prefix boost (p = 0.1, prefix capped at 4) applied ONLY when
  *     jaro > 0.7 (the classic boost threshold);
  *   - EITHER side empty → 0.0 (including both-empty, where the textbook
  *     definition says 1.0 — DuckDB returns 0).
  *
  * Comparison is over Unicode code points (not UTF-16 chars), matching
  * DuckDB's code-point semantics for supplementary-plane text.
  *
  * Stays inside whole-stage codegen: one static call per row, zero boxing.
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler$$.MODULE$$.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def similarity(u1: UTF8String, u2: UTF8String): Double = {
    val a = u1.toString.codePoints().toArray
    val b = u2.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0 // DuckDB: empty side -> 0, even both
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && b(j) == a(i)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b, in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var prefix = 0
      val maxP = math.min(4, math.min(la, lb))
      while (prefix < maxP && a(prefix) == b(prefix)) prefix += 1
      jaro + prefix * 0.1 * (1.0 - jaro)
    }
  }
}
