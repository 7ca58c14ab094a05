package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst Z-order (Morton) interleave of two non-negative
  * coordinates: bit i of `x` lands at result bit 2i, bit i of `y` at
  * bit 2i+1, over the low 30 bits of each input (higher bits are masked
  * off), so the result is a non-negative 60-bit long.
  *
  * Why it exists: at 100 TB the dominant spatial-query cost is how tile
  * data is laid out in storage. Sorting / range-partitioning on the
  * interleaved key keeps 2-D-adjacent subtiles adjacent in files, so a
  * viewport or parent-tile scan touches O(few) parquet row groups
  * instead of striding the whole dataset (the same layout idea behind
  * Delta/Iceberg Z-ORDER clustering). Key property, used by the pyramid:
  * the zoom-k parent of a subtile owns one contiguous range of zoom-n
  * Z-values — `zorder(x >> d, y >> d) == zorder(x, y) >> 2d`.
  *
  * Codegen'd magic-number bit spreading — five shift/mask steps per
  * coordinate, no loop, no allocation; stays inside whole-stage codegen.
  */
case class ZOrder60(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"zorder60 expects two bigint arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder60"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder60.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrder60.interleave($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder60 =
    copy(left = newLeft, right = newRight)
}

object ZOrder60 {

  /** Spread the low 30 bits of `v` to the even bit positions 0,2,..,58. */
  def spread(v: Long): Long = {
    var x = v & 0x3FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)
}
