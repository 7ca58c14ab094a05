package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial (second-stage) aggregation over a temporally-aggregated frame.
  *
  * Semantics (reference: flows/common.py:97-160): group by the given keys and
  * aggregate the temporal columns with the requested agg functions. Output
  * column naming is `s_{agg}_t_{tagg}` (e.g. `s_mean_t_sum`); `s_count` is
  * the count of non-null `t_mean` values. With a weight column, additionally
  * `s_wavg_t_{sum,mean,wavg} = sum(t_x * w) / sum(w)` and the plain spatial
  * aggs of `t_wavg`.
  *
  * Spark-first: the whole matrix is ONE `groupBy(...).agg(...)` (single
  * shuffle, partial+final hash agg with map-side combine); the weighted
  * ratios are a post-projection, fused by codegen. Returns the frame plus the
  * ordered list of produced agg columns (the reference's CSV header order).
  */
object Spatial {

  private def aggFn(name: String): Column => Column = name match {
    case "sum"   => sum(_)
    case "mean"  => avg(_)
    case "min"   => min(_)
    case "max"   => max(_)
    case other   => throw new IllegalArgumentException(s"unsupported spatial agg: $other")
  }

  /** @param groupby      grouping keys (must exist in df)
    * @param spatialAggs  aggs to apply, from {sum, mean, min, max, count}
    *                     ("count" is handled specially as `s_count`)
    * @param weightColumn weight column name or "" when unweighted
    * @return (aggregated frame, agg column names in canonical order)
    */
  def aggregate(
      df: DataFrame,
      groupby: Seq[String],
      spatialAggs: Seq[String],
      weightColumn: String = ""
  ): (DataFrame, Seq[String]) = {
    val aggs = spatialAggs.filterNot(_ == "count")
    val weighted = weightColumn.nonEmpty && df.columns.contains(weightColumn)

    // canonical output order: t_sum aggs, t_mean aggs, s_count, [t_wavg aggs, s_wavg_*]
    val base: Seq[Column] =
      aggs.map(a => aggFn(a)(col("t_sum")).as(s"s_${a}_t_sum")) ++
        aggs.map(a => aggFn(a)(col("t_mean")).as(s"s_${a}_t_mean")) :+
        count(col("t_mean")).as("s_count")

    val weightedAggs: Seq[Column] =
      if (!weighted) Seq.empty
      else
        Seq(
          sum(col("t_sum") * col(weightColumn)).as("_wsum_t_sum"),
          sum(col("t_mean") * col(weightColumn)).as("_wsum_t_mean"),
          sum(col("t_wavg") * col(weightColumn)).as("_wsum_t_wavg"),
          sum(col(weightColumn)).as("_s_weight")
        ) ++ aggs.map(a => aggFn(a)(col("t_wavg")).as(s"s_${a}_t_wavg"))

    val allAggs = base ++ weightedAggs
    val grouped = df.groupBy(groupby.map(col): _*).agg(allAggs.head, allAggs.tail: _*)

    val aggColumns =
      aggs.map(a => s"s_${a}_t_sum") ++
        aggs.map(a => s"s_${a}_t_mean") ++ Seq("s_count") ++
        (if (weighted)
           aggs.map(a => s"s_${a}_t_wavg") ++
             Seq("s_wavg_t_sum", "s_wavg_t_mean", "s_wavg_t_wavg")
         else Seq.empty)

    val result =
      if (!weighted) grouped
      else
        grouped
          .withColumn("s_wavg_t_sum", col("_wsum_t_sum") / col("_s_weight"))
          .withColumn("s_wavg_t_mean", col("_wsum_t_mean") / col("_s_weight"))
          .withColumn("s_wavg_t_wavg", col("_wsum_t_wavg") / col("_s_weight"))
          .drop("_wsum_t_sum", "_wsum_t_mean", "_wsum_t_wavg", "_s_weight")

    (result, aggColumns)
  }
}
