package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native two-level (IVF-of-centroids) max-cosine centroid assignment —
  * the approximate-assignment half of hierarchical SemDeDup: pick the
  * `nProbe` best COARSE cells for the row's vector, then argmax over
  * only the fine centroids belonging to those cells, returning the
  * GLOBAL fine centroid id. Cuts assignment cost from n·k to
  * n·(√k·(1+nProbe·avgCellSize/√k)) ≈ n·√k — the flat n·k scan is the
  * term that turns SemDeDup quadratic when k grows with the corpus
  * (measured 14× on 10× rows at sf10; see SCALE.md round-13).
  *
  * Deterministic contract (structurally mirrored by the d24 oracle SQL):
  *  - coarse ranking: cosine DESC, NaN worst, ties to the LOWEST coarse
  *    id (== `ROW_NUMBER() OVER (ORDER BY cos DESC NULLS LAST, id)`);
  *  - final argmax over probed members: cosine DESC, ties to the LOWEST
  *    fine cent id;
  *  - a vector with no scoreable candidate (all-NaN, e.g. zero-norm)
  *    falls back to the lowest member id among its probed cells — the
  *    same row the SQL's NULLS-LAST + id tiebreak selects;
  *  - probed cells with no members contribute nothing; if NO probed cell
  *    has members the row returns -1 (the SQL's inner join drops it —
  *    callers filter `cent_id >= 0`).
  *
  * The packed table (fine centroids, coarse centroids, member lists) is
  * one foldable struct literal, parsed once per task. */
case class BestCentroidProbe(
    left: Expression, right: Expression, nProbe: Int, normalize: Boolean)
    extends BinaryExpression {

  require(right.foldable, "best_centroid_probe expects a literal packed table")
  require(nProbe >= 1, "nProbe must be at least 1")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "best_centroid_probe"

  @transient private lazy val packed: (Array[Array[Double]], Array[Array[Double]], Array[Array[Int]]) = {
    val row = right.eval(null).asInstanceOf[InternalRow]
    def arrsD(a: ArrayData): Array[Array[Double]] =
      Array.tabulate(a.numElements())(i => a.getArray(i).toDoubleArray())
    def arrsI(a: ArrayData): Array[Array[Int]] =
      Array.tabulate(a.numElements())(i => a.getArray(i).toIntArray())
    (arrsD(row.getArray(0)), arrsD(row.getArray(1)), arrsI(row.getArray(2)))
  }
  @transient private lazy val cents = packed._1
  @transient private lazy val coarse = packed._2
  @transient private lazy val members = packed._3
  @transient private lazy val centNorms: Array[Double] =
    cents.map(c => math.sqrt(BestCentroid.dot(c, c, c.length)))
  @transient private lazy val coarseNorms: Array[Double] =
    coarse.map(c => math.sqrt(BestCentroid.dot(c, c, c.length)))

  private def score(x: Array[Double], vn: Double,
      c: Array[Double], cn: Double): Double = {
    val d = BestCentroid.dot(x, c, math.min(x.length, c.length))
    if (!normalize) d
    else {
      val denom = vn * cn
      if (denom > 0.0) d / denom else Double.NaN
    }
  }

  def computeRow(v: ArrayData): Int = {
    val x = v.toDoubleArray()
    val vn = if (normalize) math.sqrt(BestCentroid.dot(x, x, x.length)) else 1.0
    val nc = coarse.length
    val used = new Array[Boolean](nc)
    var bestScore = Double.NegativeInfinity
    var bestId = -1
    var found = false
    var minCand = Int.MaxValue
    var p = 0
    val probes = math.min(nProbe, nc)
    while (p < probes) {
      // next coarse cell: non-NaN beats NaN, then score desc, then the
      // earliest (lowest) id — i ascends, so the first of an exact tie wins
      var selId = -1
      var selScore = 0.0
      var selNaN = true
      var i = 0
      while (i < nc) {
        if (!used(i)) {
          val s = score(x, vn, coarse(i), coarseNorms(i))
          val nan = java.lang.Double.isNaN(s)
          val better =
            if (selId == -1) true
            else if (nan != selNaN) !nan
            else !nan && s > selScore
          if (better) { selId = i; selScore = s; selNaN = nan }
        }
        i += 1
      }
      used(selId) = true
      val mem = members(selId)
      var j = 0
      while (j < mem.length) {
        val cid = mem(j)
        if (cid < minCand) minCand = cid
        val s = score(x, vn, cents(cid), centNorms(cid))
        if (!java.lang.Double.isNaN(s) &&
            (!found || s > bestScore || (s == bestScore && cid < bestId))) {
          bestScore = s; bestId = cid; found = true
        }
        j += 1
      }
      p += 1
    }
    if (found) bestId
    else if (minCand != Int.MaxValue) minCand
    else -1
  }

  override protected def nullSafeEval(v: Any, ignored: Any): Any =
    computeRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bestCentroidProbe", this,
      classOf[BestCentroidProbe].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.computeRow($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BestCentroidProbe =
    copy(left = newLeft, right = newRight)
}
