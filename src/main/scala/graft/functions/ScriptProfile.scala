package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst script-mix profile — ONE pass over the string's UTF-8
  * bytes producing struct(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic,
  * n_digit, dominant).
  *
  * Bit-identical to the regexp formulation
  * ([[TextFunctions.scriptProfileRegexp]], kept as the equivalence-test
  * witness) for non-null input: each count is the number of code points
  * in the explicit BMP range ([[TextFunctions.ScriptRanges]] — ranges
  * are disjoint, so per-code-point classification and per-range
  * `regexp_replace` deletion count the same characters), and `dominant`
  * is the earliest script whose count ties-or-beats every later one.
  * Intentional divergence on NULL input (unreachable from the curation
  * pipelines, which gate on non-null text): the regexp fold yields a
  * struct of null counts with dominant "arabic" (the `when` chain's
  * fall-through), this expression yields a null struct — the saner
  * semantics.
  *
  * Why native: the regexp formulation is 6 full `regexp_replace` scans
  * per row (one per range plus digits) each materializing a stripped
  * copy of the string just to measure its length. At 100 TB that is 6×
  * the scan work and 6 transient string allocations per document; this
  * expression decodes each code point once, bumps a counter, and
  * participates in whole-stage codegen — the `lsh_buckets` lesson
  * applied to text. */
case class ScriptProfile(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // Seq[DataType] <: Seq[AbstractDataType] (covariance) — AbstractDataType
  // itself is private[sql] in Spark 4.1, so the override is declared with
  // the public subtype.
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ScriptProfile.schema
  override def prettyName: String = "script_profile"

  override protected def nullSafeEval(s: Any): Any =
    ScriptProfile.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ScriptProfile.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): ScriptProfile =
    copy(child = newChild)
}

object ScriptProfile {

  /** Script order = [[TextFunctions.ScriptRanges]] order = the dominant
    * tie-break priority. */
  private val ScriptNames = Seq("latin", "cyrillic", "greek", "cjk", "arabic")

  val schema: StructType = StructType(
    ScriptNames.map(n => StructField(s"n_$n", IntegerType, nullable = false)) ++
      Seq(StructField("n_digit", IntegerType, nullable = false),
        StructField("dominant", StringType, nullable = false)))

  // interned dominant values: one UTF8String per script for the whole JVM
  private val DominantValues: Array[UTF8String] =
    ScriptNames.map(UTF8String.fromString).toArray

  /** One UTF-8 decode pass: classify each code point into its (disjoint)
    * range, then argmax the five script counts with earliest-wins ties. */
  def compute(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val len = b.length
    val counts = new Array[Int](6)
    var i = 0
    while (i < len) {
      val b0 = b(i) & 0xff
      var cp = b0
      var n = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; n = 2 }
        else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; n = 3 }
        else { cp = b0 & 0x07; n = 4 }
        var j = 1
        while (j < n && i + j < len) {
          cp = (cp << 6) | (b(i + j) & 0x3f)
          j += 1
        }
      }
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) counts(0) += 1
      else if (cp >= 0x0400 && cp <= 0x04ff) counts(1) += 1
      else if (cp >= 0x0370 && cp <= 0x03ff) counts(2) += 1
      else if (cp >= 0x4e00 && cp <= 0x9fff) counts(3) += 1
      else if (cp >= 0x0600 && cp <= 0x06ff) counts(4) += 1
      else if (cp >= '0' && cp <= '9') counts(5) += 1
      i += n
    }
    var best = 0
    var k = 1
    while (k < 5) {
      if (counts(k) > counts(best)) best = k
      k += 1
    }
    new GenericInternalRow(Array[Any](
      counts(0), counts(1), counts(2), counts(3), counts(4), counts(5),
      DominantValues(best)))
  }
}
