package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.DotProduct

/** Optimizer rule (SURVEY §7.3.3): rewrite the pure-SQL dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)
  *
  * into the codegen'd `DotProduct(a, b)` expression — users writing the
  * portable HOF formulation (the documented fallback when the extension jar
  * is absent) silently get the fused primitive loop (~5× on the ANN sweep).
  *
  * Semantics-preserving by construction: `DotProduct` returns NULL for
  * length-mismatched arrays, exactly like the HOF chain (zip_with null-pads,
  * the Add then null-propagates), and both fold sequentially over doubles.
  * The match is deliberately narrow — double element types, literal 0.0
  * zero, bare multiply/add of the lambda variables, identity finish — so
  * anything else is left untouched.
  *
  * Installed by GraftExtensions via `injectOptimizerRule`.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
            Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(acc1: NamedLambdaVariable, el1: NamedLambdaVariable, _),
          Seq(acc2: NamedLambdaVariable, el2: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fin2: NamedLambdaVariable), _))
        if zero == 0.0d &&
          sameVars(Seq(x1, y1), Seq(x2, y2)) &&
          sameVars(Seq(acc1, el1), Seq(acc2, el2)) &&
          fin.exprId == fin2.exprId &&
          isDoubleArray(a.dataType) && isDoubleArray(b.dataType) =>
      DotProduct(a, b)
  }

  private def isDoubleArray(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The multiply/add operands must be exactly the lambda's own variables,
    * in either order (both ops are commutative).
    */
  private def sameVars(used: Seq[NamedLambdaVariable], declared: Seq[NamedLambdaVariable]): Boolean = {
    val u = used.map(_.exprId).toSet
    val d = declared.map(_.exprId).toSet
    u == d && u.size == 2
  }
}
