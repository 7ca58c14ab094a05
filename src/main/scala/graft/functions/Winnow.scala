package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst winnowing fingerprints over a token array
  * (`array<string>`): the DISTINCT window-minimum selection of
  * Schleimer/Wilkerson/Aiken's MOSS scheme (SIGMOD'03), sorted ascending,
  * computed per row in one generated-code loop.
  *
  * Bit-identical to the posexplode + bounded-frame-window formulation it
  * replaced ([[graft.operators.Dedup.winnowFingerprintsAgg]], kept as the
  * equivalence-test witness) and to the DuckDB oracle mirrors: positional
  * word n-gram strings joined by single spaces (concat_ws semantics),
  * each hashed to the 60-bit prefix of its md5 (first 15 hex digits —
  * the engine-wide `shingleHash60`), a `window`-wide sliding minimum
  * taken over FULL windows only, minima deduplicated and sorted (the
  * `sort_array(collect_set(...))` contract). Documents too short for one
  * full window (fewer than `window + n - 1` tokens) return NULL — the
  * rows the windowed formulation's filter leaves fingerprint-less.
  *
  * Why native: the windowed formulation pays one exploded row per
  * positional shingle plus a doc-keyed SHUFFLE and per-doc sort just to
  * run a 4-wide rolling minimum that never crosses document boundaries.
  * As a projection the fingerprint stage is shuffle-free at any corpus
  * size; only the fingerprint-keyed pair join that genuinely needs
  * co-location exchanges data.
  */
case class Winnow60(child: Expression, n: Int, window: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0, "shingle width must be positive")
  require(window > 0, "winnowing window must be positive")

  // Seq[DataType] <: Seq[AbstractDataType] (covariance) — AbstractDataType
  // itself is private[sql] in Spark 4.1, so the override is declared with
  // the public subtype.
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow60"

  // no full window -> NULL fingerprint set
  override def nullable: Boolean = true

  override protected def nullSafeEval(tokens: Any): Any =
    Winnow60.compute(tokens.asInstanceOf[ArrayData], n, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the no-window NULL surfaces by re-flagging isNull inside the
    // null-safe body (the standard pattern for maybe-null results)
    nullSafeCodeGen(ctx, ev, arr => s"""
      |${ev.value} = graft.functions.Winnow60.compute($arr, $n, $window);
      |${ev.isNull} = ${ev.value} == null;
      """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Winnow60 =
    copy(child = newChild)
}

object Winnow60 {

  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val space = UTF8String.fromString(" ")

  /** 60-bit shingle hash: first 15 md5 hex digits as a long — the first 8
    * digest bytes big-endian, shifted right one nibble to drop hex digit
    * 16. Exactly `conv(substring(md5(s), 1, 15), 16, 10)`. */
  def hash60(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    val be = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  /** Distinct sorted window minima, or null when no full window fits.
    * O(m·window) minima scan (window is small — 4 in every caller) then
    * one sort + in-place dedup. */
  def compute(tokens: ArrayData, n: Int, window: Int): ArrayData = {
    val len = tokens.numElements()
    val m = len - n + 1 // positional shingle count
    if (m < window) return null
    val h = new Array[Long](m)
    val shingle = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var k = 0
      while (k < n) {
        shingle(k) = if (tokens.isNullAt(i + k)) null else tokens.getUTF8String(i + k)
        k += 1
      }
      h(i) = hash60(UTF8String.concatWs(space, shingle: _*))
      i += 1
    }
    val mins = new Array[Long](m - window + 1)
    var s = 0
    while (s <= m - window) {
      var mn = h(s)
      var j = 1
      while (j < window) {
        if (h(s + j) < mn) mn = h(s + j)
        j += 1
      }
      mins(s) = mn
      s += 1
    }
    java.util.Arrays.sort(mins)
    var out = 1
    var r = 1
    while (r < mins.length) {
      if (mins(r) != mins(out - 1)) { mins(out) = mins(r); out += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }
}
