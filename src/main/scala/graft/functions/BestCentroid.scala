package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst max-similarity centroid assignment: the index (in
  * array order = cent_id) of the centroid maximizing the similarity to
  * the row's vector, ties to the LOWEST index — exactly the
  * `max(struct(cos, -cent_id))` of the broadcast-join formulation it
  * replaces, without materializing vector × centroid rows.
  *
  * `normalize = false` compares raw dot products (the spherical-k-means
  * Lloyd step, where vectors and centroids are unit — dot IS cosine and
  * the DuckDB mirror compares `list_dot_product` directly);
  * `normalize = true` compares full cosines (assignment of raw corpus
  * vectors). A row with no positive-denominator centroid (zero-norm
  * vector under `normalize`) assigns to index 0, matching the
  * max-struct formulation's null-cosine collapse; its downstream pair
  * cosines are NULL and drop regardless.
  *
  * The centroid table must be a foldable literal (it is always small
  * enough to collect — that is the broadcast-assign regime this engine
  * documents); it is parsed ONCE per task, not per row. Why native: the
  * join + hash-agg formulation explodes every vector into k rows and
  * shuffles the corpus to re-group them — at k grown linearly with the
  * corpus (the SemDeDup regime) that is a k× row blow-up per Lloyd
  * pass. Here assignment is a projection doing k·dims flops per row off
  * the scan. */
case class BestCentroid(left: Expression, right: Expression, normalize: Boolean)
    extends BinaryExpression {

  require(right.foldable, "best_centroid expects a literal centroid table")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "best_centroid"

  /** Centroids parsed once per task from the foldable literal. */
  @transient private lazy val cents: Array[Array[Double]] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      arr.getArray(i).toDoubleArray()
    }
  }

  @transient private lazy val centNorms: Array[Double] =
    cents.map(c => math.sqrt(BestCentroid.dot(c, c, c.length)))

  def computeRow(v: ArrayData): Int = {
    val x = v.toDoubleArray()
    val vn = if (normalize) math.sqrt(BestCentroid.dot(x, x, x.length)) else 1.0
    var best = Double.NegativeInfinity
    var bid = 0
    var found = false
    var cid = 0
    while (cid < cents.length) {
      val c = cents(cid)
      val d = BestCentroid.dot(x, c, math.min(x.length, c.length))
      val score =
        if (!normalize) d
        else {
          val denom = vn * centNorms(cid)
          if (denom > 0.0) d / denom else Double.NaN
        }
      if (!score.isNaN && (!found || score > best)) {
        best = score; bid = cid; found = true
      }
      cid += 1
    }
    bid
  }

  override protected def nullSafeEval(v: Any, ignored: Any): Any =
    computeRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bestCentroid", this, classOf[BestCentroid].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.computeRow($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BestCentroid =
    copy(left = newLeft, right = newRight)
}

object BestCentroid {
  private[graft] def dot(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
}
