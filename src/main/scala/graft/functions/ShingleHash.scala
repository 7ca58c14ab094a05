package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst shingle hashing over a token array (`array<string>`):
  * the DISTINCT word n-gram strings of the document, each hashed to the
  * engine-wide 60-bit md5 prefix (`shingleHash60` semantics), in one
  * generated per-row loop. With `dedupHashes` the 60-bit values are
  * additionally deduplicated in-row — and since every document enters as
  * ONE row, that fully replaces the (doc_id, hash)-keyed DataFrame
  * `.distinct()` the shingle-join family used to pay a shuffle for.
  *
  * Matches the SQL formulation it replaced (`array_distinct` over
  * `concat_ws(' ', ...)` n-grams, then `conv(substring(md5(s), 1, 15),
  * 16, 10)`) — the d2/d5/d11/t11/t17 DuckDB oracles gate the equality
  * end-to-end, and ShingleHashSpec pins the frame-level multiset parity
  * on both codegen paths. Documents with fewer than n tokens return an
  * empty array (the rows `explode` drops, exactly as before).
  *
  * Why native: `transform`/`flatten`/`array_distinct` are higher-order
  * expressions that run on the interpreted path — per-shingle closure
  * dispatch and a materialized array of shingle STRINGS per document,
  * re-hashed downstream by a separate md5 projection. This expression
  * participates in whole-stage codegen and emits the 60-bit longs
  * directly; the exploded stream carries 8-byte hashes instead of
  * n-token strings. */
case class ShingleHash60(child: Expression, n: Int, dedupHashes: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0, "shingle width must be positive")

  // Seq[DataType] <: Seq[AbstractDataType] (covariance) — AbstractDataType
  // itself is private[sql] in Spark 4.1, so the override is declared with
  // the public subtype.
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash60"

  override protected def nullSafeEval(tokens: Any): Any =
    ShingleHash60.compute(tokens.asInstanceOf[ArrayData], n, dedupHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.ShingleHash60.compute($arr, $n, $dedupHashes);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

object ShingleHash60 {

  private val space = UTF8String.fromString(" ")

  /** Distinct shingle strings hashed to 60 bits (order of first
    * occurrence; consumers explode into unordered bags). Empty array when
    * no shingle fits. */
  def compute(tokens: ArrayData, n: Int, dedupHashes: Boolean): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[UTF8String]()
    val hashes = new java.util.ArrayList[java.lang.Long]()
    val seenHashes = if (dedupHashes) new java.util.HashSet[java.lang.Long]() else null
    val shingle = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var k = 0
      while (k < n) {
        shingle(k) = if (tokens.isNullAt(i + k)) null else tokens.getUTF8String(i + k)
        k += 1
      }
      val s = UTF8String.concatWs(space, shingle: _*)
      if (seen.add(s)) {
        val h = Winnow60.hash60(s)
        if (seenHashes == null || seenHashes.add(h)) hashes.add(h)
      }
      i += 1
    }
    val out = new Array[Long](hashes.size())
    var j = 0
    while (j < out.length) { out(j) = hashes.get(j); j += 1 }
    new GenericArrayData(out)
  }
}
