package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two ArrayType(DoubleType) columns — the
  * building block for LSH hyperplane signatures (AnnLsh) and any linear
  * scoring. Same contract as CosineSimilarity: sequential left fold,
  * callers cast inputs to array<double>.
  *
  * Length-mismatched inputs yield NULL — exactly what the HOF formulation
  * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (s,x)->s+x)` produces (zip_with
  * null-pads, the sum then null-propagates), which is what makes the
  * RewriteHofDotProduct optimizer rule semantics-preserving.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true // null on ragged inputs

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0
      var i = 0
      while (i < n) {
        // null element anywhere -> NULL, like the HOF chain (zip_with product
        // is null, Add null-propagates)
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        dot += x.getDouble(i) * y.getDouble(i); i += 1
      }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
