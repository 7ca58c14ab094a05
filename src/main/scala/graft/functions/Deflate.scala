package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst DEFLATE-compressed length of a string's UTF-8 bytes
  * (raw stream, no zlib header, level 6).
  *
  * The length alone is the useful signal: `deflate_len / byte_len` is the
  * classic compression-ratio quality score for training-data curation —
  * boilerplate and template spam compress far below natural prose, random
  * noise barely compresses at all, so both tails can be filtered with one
  * scan. Per-row work only (no shuffle), and the Deflater + output buffer
  * are thread-local so the hot loop allocates nothing but the input copy.
  *
  * Determinism: for a fixed input, level, and `nowrap` flag, the JDK's
  * bundled zlib produces one fixed stream within a JVM — and the value is
  * only compared engine-internally (spec assertions + rows-only battery
  * check), never against a DuckDB oracle.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"deflate_len expects a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(s: Any): Any =
    DeflateLen.deflatedLength(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.DeflateLen.deflatedLength($s);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  private val deflater = ThreadLocal.withInitial[Deflater](() =>
    new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true))
  private val buf = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](16 * 1024))

  /** Length in bytes of the raw-DEFLATE stream of `s`'s UTF-8 bytes. */
  def deflatedLength(s: UTF8String): Int = {
    val d = deflater.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val b = buf.get()
    var total = 0
    while (!d.finished()) total += d.deflate(b)
    total
  }
}
