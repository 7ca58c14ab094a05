package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native contiguous-phrase occurrence count over a token array: the
  * number of positions i where tokens[i..i+len) equals the phrase,
  * overlapping occurrences counted — exact phrase search at scan speed.
  *
  * Why native: the higher-order-function formulation
  * (`filter(sequence(...), i -> element_at(..) = .. AND ..)`) evaluates
  * its lambda INTERPRETED per window position — ~5 s over a 5k-doc
  * fixture; this expression is one generated-code call into a tight
  * UTF8String-comparison loop with early mismatch exit (sub-second on
  * the same fixture). The phrase must be a foldable literal (it is query
  * metadata); it is parsed once per task, not per row. */
case class PhraseCount(left: Expression, right: Expression)
    extends BinaryExpression {

  require(right.foldable, "phrase_count expects a literal phrase array")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "phrase_count"

  @transient private lazy val phrase: Array[UTF8String] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(arr.getUTF8String)
  }

  def computeRow(tokens: ArrayData): Int = {
    val n = tokens.numElements()
    val len = phrase.length
    if (len == 0 || n < len) return 0
    var count = 0
    var i = 0
    val last = n - len
    while (i <= last) {
      var j = 0
      var ok = true
      while (ok && j < len) {
        val t = tokens.getUTF8String(i + j)
        if (t == null || !t.equals(phrase(j))) ok = false
        j += 1
      }
      if (ok) count += 1
      i += 1
    }
    count
  }

  override protected def nullSafeEval(v: Any, ignored: Any): Any =
    computeRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseCount", this, classOf[PhraseCount].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.computeRow($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PhraseCount =
    copy(left = newLeft, right = newRight)
}
