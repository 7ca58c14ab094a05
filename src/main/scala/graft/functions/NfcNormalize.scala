package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — the canonical-composition pass of
  * corpus text cleaning (decomposed `e` + U+0301 → `é`, compatibility
  * singletons, Hangul jamo composition): a mis-normalized corpus
  * double-counts visually-identical strings in every dedup/vocab stage,
  * so this runs at ingest, per row, at scan speed.
  *
  * Built on the JDK's `java.text.Normalizer` (ICU-equivalent tables for
  * NFC), wrapped as a Catalyst expression with codegen so it stays
  * inside whole-stage pipelines — a Scala UDF here would box every row
  * and break the codegen span. The fast path skips allocation entirely:
  * `Normalizer.isNormalized` is O(n) with no copy, and real-world corpus
  * text is overwhelmingly already NFC. DuckDB's `nfc_normalize` is the
  * independent mirror the oracle battery compares against. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  def computeRow(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(v: Any): Any =
    computeRow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.computeRow($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
