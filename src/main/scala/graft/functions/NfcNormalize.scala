package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization: `nfc_normalize(text)` composes
  * combining sequences (e.g. `e` + U+0301 → `é`) into their canonical
  * precomposed form, the standard first step of web-corpus text cleanup —
  * without it, byte-level dedup/fingerprinting treats the two encodings of
  * the same visible string as different documents (the reference's corpus
  * arrives as JSON whose producers are free to emit either form).
  *
  * Stays inside whole-stage codegen (one static call per row, no UDF).
  * `Normalizer.isNormalized` is a cheap scan that short-circuits the common
  * case — ASCII and already-composed text allocates nothing but the
  * defensive clone. The DuckDB oracle mirror is its `nfc_normalize()`;
  * both sides implement Unicode canonical composition, so results are
  * byte-identical (pinned via md5 in q108).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(t: Any): Any =
    NfcNormalize.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) {
      // clone: the input may alias a reused row buffer (same reason as
      // ShingleArray's whole-text degenerate case)
      text.clone()
    } else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}
