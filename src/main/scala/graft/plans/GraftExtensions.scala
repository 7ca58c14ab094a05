package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{SimHash60, VectorDot}

/** Session extensions registering the engine's native Catalyst functions.
  * Install with `spark.sql.extensions=graft.plans.GraftExtensions`, or call
  * [[GraftExtensions.register]] on an existing session (idempotent) — the
  * operator library does the latter automatically where it needs them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDot)
    ext.injectFunction(GraftExtensions.simHash60)
  }
}

object GraftExtensions {
  private val vecDot = (
    new FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "vec_dot takes exactly 2 arguments")
      VectorDot(children.head, children(1))
    }
  )

  private val simHash60 = (
    new FunctionIdentifier("simhash60"),
    new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "simhash60 takes exactly 1 argument")
      SimHash60(children.head)
    }
  )

  private val all = Seq(vecDot, simHash60)

  /** Idempotently register the functions on a live session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}
