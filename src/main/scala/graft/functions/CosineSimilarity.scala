package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd cosine similarity over two ArrayType(DoubleType) columns
  * (SURVEY §7.3.1).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`,
  * VectorFunctions.cosineHof) is evaluated interpreted — one closure call per
  * element per row. This expression compiles to a single fused primitive
  * loop inside whole-stage codegen: one pass computes dot, |a|² and |b|²
  * simultaneously, no allocation. Same accumulation order (sequential left
  * fold) and same formula dot/(√|a|²·√|b|²) as the HOF version and DuckDB's
  * list_cosine_similarity, so results agree bit-for-bit modulo the final
  * 6-dp rounding.
  *
  * Zero-length or zero-norm inputs yield NaN (0/0), matching DuckDB.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers must supply ArrayType(DoubleType) inputs (cast at the call site,
  // as VectorFunctions.cosine's sites do) — AbstractDataType/ExpectsInputTypes
  // are private[sql], so leaf-type enforcement happens there, not here.
  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true // null on length-mismatched inputs

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null // match HOF null-prop
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
