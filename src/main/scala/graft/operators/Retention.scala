package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention — the product-analytics counterpart of the funnel:
  * users grouped by the period of their FIRST activity (the cohort),
  * then counted in every later period they return. The output is the
  * classic retention matrix (cohort, offset, n_users).
  *
  * Periods are epoch-anchored fixed windows (`periodMs`), so the
  * assignment is pure integer arithmetic — no calendar, no timezone,
  * deterministic on any engine. Pre-epoch timestamps floor toward
  * negative infinity (Spark `floor`); engines whose integer division
  * truncates toward zero (DuckDB `//`: -5 // 2 = -2) disagree there —
  * mirror with a floor-division idiom if the stream predates 1970.
  *
  * Scale shape: THREE exchanges, no join — (user, period) activity
  * dedups in one hash aggregation, the cohort period attaches as a MIN
  * window over the user partitioning (which the dedup's shuffle already
  * provides after one user-keyed exchange), and the matrix is one
  * (cohort, offset) aggregation of user-period-sized rows. Nothing
  * event-sized survives the first dedup; a 100 TB event log reduces to
  * |users|·|active periods| rows immediately.
  */
object Retention {

  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsMsCol: Column,
      periodMs: Long = 7L * 24 * 3600 * 1000
  ): DataFrame = {
    require(periodMs > 0, "periodMs must be positive")
    val activity = events
      .select(col(userCol).as("user"), floor(tsMsCol / periodMs).as("period"))
      .distinct()
    activity
      .withColumn("cohort", min("period").over(Window.partitionBy("user")))
      .groupBy(col("cohort").as("cohort_period"),
        (col("period") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
