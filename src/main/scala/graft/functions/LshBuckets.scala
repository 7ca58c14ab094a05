package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** Native multi-table random-hyperplane LSH bucketing: all
  * `tables × planesPerTable` sign bits of one vector in a single tight
  * loop, returning the `array<struct<t:int, bucket:int>>` the bucket
  * explode consumes.
  *
  * Why native: the expression-tree formulation built one
  * `vec_dot(cast(v), CreateArray(64 literals))` node PER PLANE — ~100
  * dot expressions and ~6k literal nodes in a single projection, which
  * overflows whole-stage codegen's method-size budget and drops the
  * whole projection to interpreted evaluation (measured: a plain
  * groupBy-count over the bucketed stream of a 200k-vector corpus took
  * 138 s — the LSH hashing, not the aggregation). Here the plane
  * components come from the same [[planeComponent]] formula, PRECOMPUTED
  * once per task into primitive arrays, and each row pays exactly
  * `tables · planes · dims` fused multiply-adds inside codegen.
  *
  * Bit-parity with the tree form is pinned by CorpusOpsSpec: the dot is
  * the same left-to-right sum over `min(dims, |v|)` (VectorDot's
  * contract — components beyond the vector's length contribute nothing),
  * float inputs are widened per element exactly like the old
  * `cast(array<float> as array<double>)`, and the sign threshold is the
  * same `>= 0.0`. */
case class LshBuckets(child: Expression, dims: Int, tables: Int, planes: Int)
    extends UnaryExpression {

  require(dims >= 1 && tables >= 1 && planes >= 1 && planes <= 30,
    "lsh_buckets expects dims/tables >= 1 and 1 <= planes <= 30")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("t", IntegerType, nullable = false),
      StructField("bucket", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "lsh_buckets"

  // the tree form this replaced cast ANY numeric array to array<double>;
  // here the element read is typed, so unsupported element types must be
  // rejected at analysis — v.getDouble over an int array would silently
  // reinterpret 4-byte slots as doubles and bucket garbage
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets expects array<float> or array<double>, got " +
            other.catalogString)
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** [tables·planes][dims] plane components, the exact
    * [[LshBuckets.planeComponent]] doubles the literal arrays held. */
  @transient private lazy val comps: Array[Array[Double]] =
    Array.tabulate(tables * planes) { i =>
      Array.tabulate(dims)(d => LshBuckets.planeComponent(i, d, dims))
    }

  def computeRow(v: ArrayData): ArrayData = {
    val len = v.numElements()
    val lim = math.min(dims, len)
    val x = new Array[Double](lim)
    var d = 0
    while (d < lim) {
      x(d) = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
      d += 1
    }
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < planes) {
        val c = comps(t * planes + p)
        var s = 0.0
        var i = 0
        while (i < lim) { s += x(i) * c(i); i += 1 }
        if (s >= 0.0) bucket |= (1 << p)
        p += 1
      }
      out(t) = InternalRow(t, bucket)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    computeRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBuckets", this, classOf[LshBuckets].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.computeRow($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  /** Deterministic pseudo-random hyperplane component for (plane i, dim
    * d): an exact-in-double rational in [-0.5, 0.5) from a Knuth
    * multiplicative hash — identical across engines, no RNG state. THE
    * shared definition: `Similarity.planeComponent` delegates here, and
    * the DuckDB oracles mirror this formula in SQL. */
  def planeComponent(i: Int, d: Int, dims: Int): Double =
    (((i.toLong * dims + d) * 2654435761L) % 1000L).toDouble / 1000.0 - 0.5
}
