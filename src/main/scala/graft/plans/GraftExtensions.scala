package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.VectorDot

/** Session extensions registering the engine's native Catalyst functions.
  * Install with `spark.sql.extensions=graft.plans.GraftExtensions`, or call
  * [[GraftExtensions.register]] on an existing session (idempotent) — the
  * operator library does the latter automatically where it needs them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.vecDot)
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

  /** Idempotently register the functions on a live session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(vecDot._1)) {
      registry.registerFunction(vecDot._1, vecDot._2, vecDot._3)
    }
  }
}
