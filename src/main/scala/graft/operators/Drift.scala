package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-sided CUSUM drift detection (Page 1954) — the changepoint monitor
  * a metrics pipeline runs per series: the statistic
  * `S_i = max(0, S_{i-1} + (x_i - target - slack))` accumulates only
  * sustained upward drift and alarms when it clears `threshold`.
  *
  * The recursion has a closed prefix form — with
  * `P_i = Σ_{k<=i} (x_k - target - slack)`,
  * `S_i = P_i - min(0, min_{j<=i} P_j)` — so the whole detector is TWO
  * window functions (running sum + running min) over one per-key sort:
  * ONE shuffle on the series key, no fold state, no recursion, at any
  * scale. Deviations are quantized to integers (`scale`) before the
  * running sum, so every S_i is order-free exact on any engine (the
  * t19 ladder, applied to a recursive statistic).
  *
  * Returns one row per input event: (key, order cols…, cusum = S_i in
  * quantized units, alarm = S_i > threshold·scale). */
object Drift {

  def cusum(
      events: DataFrame,
      keyCol: String,
      orderCol: Column,
      tieCol: Column,
      valueCol: Column,
      target: Double,
      slack: Double,
      threshold: Double,
      scale: Long = 100L
  ): DataFrame = {
    require(scale > 0, "scale must be positive")
    val reserved = Seq("__p", "__m", "cusum", "alarm")
    val clash = events.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"cusum() writes reserved output columns ${reserved.mkString(", ")}; " +
        s"input already has ${clash.mkString(", ")} — rename them first")
    val w = Window.partitionBy(keyCol).orderBy(orderCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = round(valueCol * scale).cast("long") -
      round(lit(target + slack) * scale).cast("long")
    val hq = round(lit(threshold) * scale).cast("long")
    events
      .withColumn("__p", sum(dev).over(w))
      .withColumn("__m", least(lit(0L), min(col("__p")).over(w)))
      .withColumn("cusum", col("__p") - col("__m"))
      .withColumn("alarm", col("cusum") > hq)
      .drop("__p", "__m")
  }
}
