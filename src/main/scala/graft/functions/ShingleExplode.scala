package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom UDTF (table-generating function), SURVEY §2.2 "UDTF / table
  * function ✎": `explode_shingles(text, n)` emits one (pos, shingle) row per
  * token n-gram — the generator twin of TextFunctions.shingles3, usable from
  * SQL (`SELECT doc_id, s.* FROM docs LATERAL VIEW explode_shingles(text, 3) s`)
  * and the Column API.
  *
  * Extends Catalyst's `Generator`, so Catalyst plans a `Generate` node
  * exactly as for built-in explode — no UDF registry, no row-object
  * round-trip for the input. Documents shorter than n degrade to a single
  * whole-text shingle, matching shingles3.
  */
case class ShingleExplode(text: Expression, n: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Nil
    else {
      val s = t.toString
      val k = n.eval(input) match {
        case null => 3
        case b: Byte => b.toInt
        case s: Short => s.toInt
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"explode_shingles: n must be an integer, got $other") // no silent 2.9 -> 2
      }
      // limit -1: keep trailing empty tokens, matching Spark's split(text,' ')
      // so this generator and TextFunctions.shingles3 tokenize identically
      val toks = s.split(" ", -1)
      if (toks.length < k || k <= 0) {
        Seq(InternalRow(0, UTF8String.fromString(s)))
      } else {
        (0 to toks.length - k).map { i =>
          InternalRow(i, UTF8String.fromString(toks.slice(i, i + k).mkString(" ")))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), n = newChildren(1))
}
