package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd |A ∩ B| over two SORTED-ASCENDING, DUPLICATE-FREE
  * ArrayType(IntegerType) columns — the verify kernel of the exact
  * set-similarity joins (operators.SetSimJoin), where it replaces
  * `size(array_intersect(a, b))`.
  *
  * Why not the builtin: `array_intersect` builds an OpenHashSet over one
  * side and MATERIALIZES the intersection array, per row — allocation +
  * hashing for a result whose only consumer is `size()`. SetSimJoin's
  * verify runs this once per candidate pair (hundreds of millions at the
  * rehearsal SFs), and its inputs are already sorted int dictionaries, so
  * a two-pointer merge COUNT is the information-theoretic floor:
  * O(|a|+|b|) int compares, zero allocation, branch-local codegen.
  *
  * Contract (enforced upstream, documented here): elements ascending and
  * distinct (SetSimJoin arrays are array_sort'ed bijective token ids).
  * Unsorted input gives an UNDERCOUNT, never a crash. NULL array or NULL
  * element → NULL result (same propagation as the builtin chain).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true // null on null element

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xi = x.getInt(i)
      val yj = y.getInt(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  int $xi = $a.getInt($i);
         |  int $yj = $b.getInt($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $c; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Column-level helper: |a ∩ b| (BIGINT) for sorted distinct int arrays. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
