package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd token n-gram shingling: `shingle_array(text, distinct)`,
  * width 3 by default (the dedup-family fixture width); decontamination
  * uses width 13 (the public GPT-3 appendix-C / FLAN recipe).
  *
  * Replaces the HOF formulation `transform(sequence(...), i ->
  * concat_ws(' ', slice(tokens, i, 3)))` on the dedup hot path. Spark
  * evaluates HOF lambdas interpreted — one closure call (plus a fresh slice
  * array) per shingle per row — which measured ~2× the whole signature-stage
  * cost at sf0.1. This expression is one `compute` call per row inside
  * whole-stage codegen: single split, one rolling loop, optional first-
  * occurrence dedup. Unlike the window-`lead` trigram shape (also ~2×
  * faster locally), it needs NO shuffle of the tokenized corpus — at 100 TB
  * the window shape reshuffles every token once; this stays map-side.
  *
  * Semantics match `TextFunctions.shingles3Hof` (+ `array_distinct` when
  * `distinct`) exactly: split on single space keeping empties, documents
  * under 3 tokens degrade to one whole-text shingle, dedup keeps first
  * occurrence. The DuckDB oracle mirror is unchanged
  * (`list_transform(range(...))` over `string_split`).
  */
case class ShingleArray(child: Expression, distinct: Boolean, n: Int = 3)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingle_array"

  override def nullSafeEval(t: Any): Any =
    ShingleArray.compute(t.asInstanceOf[UTF8String], distinct, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleArray$$.MODULE$$.compute($c, $distinct, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleArray {
  def compute(text: UTF8String, distinct: Boolean, n: Int): ArrayData = {
    // String.split with a 1-char non-regex pattern takes the JDK fast path
    // (no Pattern compile); -1 keeps trailing empty tokens like SQL split
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) {
      // clone: the input UTF8String may alias a row buffer that is reused
      return new GenericArrayData(Array[Any](text.clone()))
    }
    val out = new java.util.ArrayList[AnyRef](toks.length - n + 1)
    val seen = if (distinct) new java.util.HashSet[String]() else null
    var i = 0
    while (i <= toks.length - n) {
      // width 3 dominates the dedup path; the specialized concat skips the
      // StringBuilder loop the general width needs
      val sh =
        if (n == 3) toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
        else {
          val b = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { b.append(' ').append(toks(i + j)); j += 1 }
          b.toString
        }
      if (seen == null || seen.add(sh)) out.add(UTF8String.fromString(sh))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}
