package graft.sqlext

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (UAX #15
  * canonical composition) — the crawl-cleaning staple Spark lacks as
  * a built-in. Two fetches of the same page routinely differ only in
  * decomposed-vs-composed accents ("Cafe"+U+0301 vs "Café"), which
  * breaks exact dedup, URL keys and tokenization; every production
  * text pipeline NFC-normalizes first.
  *
  * Delegates to `java.text.Normalizer` (JDK ICU data, the standard
  * UAX #15 implementation; DuckDB's `nfc_normalize` / utf8proc
  * implements the same standard, so gates hash-match). Codegen emits
  * one static call per row — stays inside whole-stage codegen.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.sqlext.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** Column-level entry point. */
  def nfc(c: Column): Column =
    GraftSqlBridge.toColumn(
      NfcNormalize(GraftSqlBridge.toExpression(c)))

  /** Java-callable kernel shared by eval and codegen. */
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    // fast path: ASCII (and most already-composed text) is NFC
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC))
  }
}
