package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst MinHash signature over a token array (`array<string>`):
  * all `numHashes` affine-permutation minima of the document's word
  * n-gram (shingle) hashes, computed per row in one generated-code loop.
  *
  * Bit-identical to the explode + hash-aggregate formulation
  * ([[graft.operators.Dedup.minHashSignaturesAgg]], kept as the
  * equivalence-test witness) and to the DuckDB oracle mirror: shingle
  * string = the n tokens joined by single spaces (concat_ws semantics —
  * null tokens are skipped, not nulled through), base hash = first 8 md5
  * hex digits masked to 31 bits, permutation i takes
  * min((2i+1)·h + i·40503 + 12345 mod 2^31-1). Documents with fewer than
  * n tokens have no shingles and hash to NULL — the same rows the
  * aggregate formulation drops (no group), so downstream band explodes
  * skip them identically.
  *
  * Why native: the aggregate formulation is already codegen'd but pays
  * one exploded row per shingle plus `numHashes` partial-min aggregate
  * slots and a doc-keyed SHUFFLE just to reassemble per-document
  * signatures. This expression is a pure projection — signatures come
  * off the scan with zero exchanges, so the signature stage of
  * d3/d17-style near-dedup scales like a filter, and only the band join
  * that genuinely needs co-location shuffles. Duplicate shingles need no
  * dedup here: a min over the multiset equals the min over the set.
  */
case class MinHash64(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0, "shingle width must be positive")
  require(numHashes > 0, "signature length must be positive")

  // Seq[DataType] <: Seq[AbstractDataType] (covariance) — AbstractDataType
  // itself is private[sql] in Spark 4.1, so the override is declared with
  // the public subtype.
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  // fewer than n tokens -> no shingles -> NULL signature
  override def nullable: Boolean = true

  override protected def nullSafeEval(tokens: Any): Any =
    MinHash64.compute(tokens.asInstanceOf[ArrayData], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the no-shingle NULL surfaces by re-flagging isNull inside the
    // null-safe body (the standard pattern for maybe-null results)
    nullSafeCodeGen(ctx, ev, arr => s"""
      |${ev.value} = graft.functions.MinHash64.compute($arr, $n, $numHashes);
      |${ev.isNull} = ${ev.value} == null;
      """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

object MinHash64 {

  /** MinHash prime modulus (2^31 - 1), shared with the aggregate witness
    * and the oracle mirrors. */
  val P = 2147483647L

  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val space = UTF8String.fromString(" ")

  /** 31-bit base hash of one shingle: first 8 md5 hex digits (= the first
    * 4 digest bytes as an unsigned int) masked to 31 bits — exactly
    * `conv(substring(md5(s), 1, 8), 16, 10) & (2^31-1)`. */
  def baseHash(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    u & P
  }

  /** Full signature, or null when the document has no shingles. Window
    * slides one token at a time; each shingle is joined with single
    * spaces (UTF8String.concatWs — the engine's own concat_ws kernel, so
    * bytes match the witness exactly, null tokens skipped). */
  def compute(tokens: ArrayData, n: Int, numHashes: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return null
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var k = 0
      while (k < n) {
        window(k) = if (tokens.isNullAt(i + k)) null else tokens.getUTF8String(i + k)
        k += 1
      }
      val h = baseHash(UTF8String.concatWs(space, window: _*))
      var p = 0
      while (p < numHashes) {
        val v = ((2L * p + 1) * h + p * 40503L + 12345L) % P
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
