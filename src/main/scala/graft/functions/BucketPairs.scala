package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native Catalyst in-bucket near-duplicate pair scorer: given one LSH
  * bucket's collected vectors `array<struct<id bigint, v array<double>,
  * nrm double>>` (sorted by id), emit every pair with
  * `round(dot(v_i, v_j) / (nrm_i * nrm_j), 4) >= minCosine` as
  * `array<struct<doc_a, doc_b, cosine>>` — the quadratic inner loop of
  * embedding near-dedup, in generated code.
  *
  * Bit-identical to the nested higher-order-lambda formulation it
  * replaced (kept as `Dedup.bucketPairsLambda`, the equivalence-test
  * witness): pairs are (i, j) with j > i in array order; a non-positive
  * norm product yields a NULL cosine, which fails the threshold and
  * drops the pair (the engine-wide zero-norm contract); the dot is the
  * `vec_dot` left-to-right min-length loop; rounding is Spark's
  * `round(x, 4)` double semantics (BigDecimal HALF_UP via the decimal
  * string value, NaN/Infinity passed through).
  *
  * Why native: the lambda formulation pays per-pair closure dispatch and
  * a materialized struct per CANDIDATE pair on the interpreted
  * higher-order path — occupancy² allocations per bucket of which only
  * the >= minCosine survivors matter. Here sub-threshold pairs live and
  * die inside a primitive loop; with occupancy held constant by
  * `autoPlanes`, scoring runs at the shuffle's speed at any corpus
  * size. */
case class BucketPairs(child: Expression, minCosine: Double)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))), containsNull = false)

  override def prettyName: String = "bucket_pairs"

  override protected def nullSafeEval(xs: Any): Any =
    BucketPairs.compute(xs.asInstanceOf[ArrayData], minCosine)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.BucketPairs.compute($arr, $minCosine);")

  override protected def withNewChildInternal(newChild: Expression): BucketPairs =
    copy(child = newChild)
}

object BucketPairs {

  /** Spark `round(x, 4)` for doubles: NaN/Infinity unchanged, else
    * HALF_UP on the decimal string value. */
  private def round4(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** `vec_dot`: left-to-right sum over the common prefix. */
  private def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    sum
  }

  /** All >= minCosine pairs of one bucket. Field positions follow the
    * producer's struct(id, v, nrm). */
  def compute(xs: ArrayData, minCosine: Double): ArrayData = {
    val n = xs.numElements()
    val out = new java.util.ArrayList[InternalRow]()
    val rows = new Array[InternalRow](n)
    var i = 0
    while (i < n) { rows(i) = xs.getStruct(i, 3); i += 1 }
    i = 0
    while (i < n) {
      val ri = rows(i)
      val idA = ri.getLong(0)
      val vA = ri.getArray(1)
      val nrmA = ri.getDouble(2)
      var j = i + 1
      while (j < n) {
        val rj = rows(j)
        val denom = nrmA * rj.getDouble(2)
        if (denom > 0.0) {
          val c = round4(dot(vA, rj.getArray(1)) / denom)
          if (c >= minCosine) {
            out.add(new GenericInternalRow(
              Array[Any](idA, rj.getLong(0), c)))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size())))
  }
}
