package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe over a long key: `bloom_probe(s,
  * bytes)` where `bytes` is a foldable binary literal holding a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] (the public
  * `writeTo` wire format of the filter `DataFrameStatFunctions
  * .bloomFilter` builds).
  *
  * Why native: the probe sits on the contamination scan's hottest filter
  * (every doc shingle passes through it), and as a Scala UDF it was the
  * one non-codegen expression in the repo — a codegen boundary that
  * forced the shingle stream out of the surrounding WholeStageCodegen
  * span. Here the filter deserializes ONCE per task (transient lazy,
  * exactly like Spark's own injected runtime-filter probe), and each row
  * is one generated-code call into `mightContainLong`. The filter
  * travels inside the serialized stage binary, which Spark broadcasts
  * per stage — the same per-executor shipping the explicit broadcast
  * variable gave the UDF. */
case class BloomProbe(left: Expression, right: Expression)
    extends BinaryExpression {

  require(right.foldable, "bloom_probe expects a literal serialized filter")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  def probe(v: Long): Boolean = filter.mightContainLong(v)

  override protected def nullSafeEval(v: Any, ignored: Any): Any =
    probe(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomProbe].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.probe($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}
