package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst 60-bit SimHash over a token array (`array<string>`).
  *
  * Bit-identical to the higher-order-lambda formulation
  * ([[TextFunctions.simHashLambda]], kept as the equivalence-test witness)
  * for null-free token arrays: per token, bit j (0-based) is nibble `j/4`
  * of `md5(token)` hex probed at position `3 - j%4`; the document bit is 1
  * when strictly more than half the tokens (multiset, so duplicates count)
  * have it set. 60 bits = 15 md5 nibbles, keeping the result non-negative
  * in a signed 64-bit long.
  *
  * Intentional divergence on null ELEMENTS (unreachable from
  * [[TextFunctions.simHash]], whose `split` never yields them): the lambda
  * fold nulls its accumulator on the first null token, which collapses the
  * whole document hash to 0; this expression skips null tokens' bits but
  * keeps them in the majority denominator — the saner semantics for a
  * hand-built token array.
  *
  * Why native: the lambda formulation runs on the interpreted
  * higher-order-function path — per-token closure dispatch, boxed
  * `array<bigint>` accumulators, and a 60-element `zip_with` allocation per
  * token. This expression participates in whole-stage codegen and does the
  * same math as one md5 per token plus a tight primitive bit-count loop —
  * it was the engine's last interpreted hot path (the d9 SimHash banded
  * near-dup spent most of its time here).
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // Seq[DataType] <: Seq[AbstractDataType] (covariance) — AbstractDataType
  // itself is private[sql] in Spark 4.1, so the override is declared with
  // the public subtype.
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(tokens: Any): Any =
    SimHash60.compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SimHash60.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** 60-bit probe pattern of one token: bit j = nibble j/4 of the md5 hex
    * digest probed at position 3 - j%4 (hex digit k = high nibble of digest
    * byte k/2 when k is even, low nibble when odd). */
  def hashToken(t: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(t.getBytes)
    var p = 0L
    var k = 0
    while (k < 15) {
      val b = d(k >> 1) & 0xff
      val nib = if ((k & 1) == 0) (b >>> 4) & 0xf else b & 0xf
      p |= (((nib >>> 3) & 1).toLong << (4 * k)) |
        (((nib >>> 2) & 1).toLong << (4 * k + 1)) |
        (((nib >>> 1) & 1).toLong << (4 * k + 2)) |
        ((nib & 1).toLong << (4 * k + 3))
      k += 1
    }
    p
  }

  /** SimHash of the token multiset: majority vote per bit over the
    * per-token probe patterns. Null tokens contribute no bits but count
    * toward the majority denominator (matching `size(ts)` in the lambda
    * formulation). */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val p = hashToken(tokens.getUTF8String(i))
        var j = 0
        while (j < 60) {
          counts(j) += ((p >>> j) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 60) {
      if (2L * counts(j) > n) res |= 1L << j
      j += 1
    }
    res
  }
}
