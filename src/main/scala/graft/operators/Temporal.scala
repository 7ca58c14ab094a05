package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schema

/** Temporal bucketing + temporal aggregation (the first of the engine's two
  * core aggregation passes).
  *
  * Semantics (reference: flows/common.py:37-91, flows/common.py:437-455):
  *  - `timestamp` (epoch ms) is normalized to the UTC start of its month /
  *    year (as epoch ms), or to 0 for resolution "all".
  *  - The frame is then hash-aggregated grouping by EVERY column except
  *    `value` (lat/lng/regions/feature/qualifiers all remain keys), producing
  *    `t_sum` and `t_mean`; with a weight column also `t_wavg` =
  *    sum(value*w)/sum(w), and the weight column is replaced by its group
  *    mean.
  *
  * Spark-first: the bucketing is a pure Catalyst expression
  * (`date_trunc` over `timestamp_millis`) so it participates in whole-stage
  * codegen, and the aggregation is a single partial+final hash aggregate —
  * no UDFs anywhere. Requires `spark.sql.session.timeZone=UTC`.
  */
object Temporal {

  /** Epoch-ms → bucket-start epoch-ms at the given resolution (month | year | all). */
  def normalizeTime(tsMs: Column, timeRes: String): Column = timeRes match {
    case "month" | "year" =>
      // date_trunc in the UTC session zone reproduces the reference's
      // datetime(year, month, 1, tzinfo=utc) arithmetic exactly.
      (unix_timestamp(date_trunc(timeRes, timestamp_millis(tsMs))) * lit(1000L)).cast("long")
    case "all" => lit(0L)
    case other => throw new IllegalArgumentException(s"time_res must be month|year|all, got $other")
  }

  /** Temporal aggregation pass. Returns the bucketed + aggregated frame with
    * `value` replaced by `t_sum`/`t_mean` (+ `t_wavg` when weighted).
    *
    * @param weightColumn name of the weight column, or "" for unweighted.
    */
  /** Mergeable partial form of the temporal aggregation — the
    * incremental-maintenance face: (keys, t_sum, t_count) instead of the
    * finalized mean, so a DELTA batch's partial merges into a standing
    * cube by pure addition ([[mergePartials]]) and the mean re-derives
    * exactly ([[finalizePartial]]). Measures are integer-valued, so the
    * partial sums are exact in doubles and
    * finalize(merge(partial(old), partial(delta))) == aggregate(full)
    * BIT-FOR-BIT — the contract the a20 oracle checks by recomputing
    * the full cube from scratch. At 100 TB this is the difference
    * between touching a day's delta and re-aggregating the corpus. */
  def aggregatePartial(df: DataFrame, timeRes: String): DataFrame = {
    val keyCols = df.columns.filterNot(_ == "value")
    df.withColumn("timestamp", normalizeTime(col("timestamp"), timeRes))
      .groupBy(keyCols.map(col).toSeq: _*)
      .agg(sum("value").as("t_sum"), count("value").as("t_count"))
  }

  /** Additive merge of [[aggregatePartial]] frames (any number of
    * deltas): one hash aggregation over the unioned partials, keyed on
    * every non-measure column. */
  def mergePartials(cubes: Seq[DataFrame]): DataFrame = {
    require(cubes.nonEmpty, "mergePartials needs at least one partial")
    val unioned = cubes.reduce(_.unionByName(_))
    val keyCols = unioned.columns.filterNot(c => c == "t_sum" || c == "t_count")
    unioned.groupBy(keyCols.map(col).toSeq: _*)
      .agg(sum("t_sum").as("t_sum"), sum("t_count").as("t_count"))
  }

  /** Derive the finalized mean from merged partials. */
  def finalizePartial(df: DataFrame): DataFrame =
    df.withColumn("t_mean", col("t_sum") / col("t_count"))

  def aggregate(df: DataFrame, timeRes: String, weightColumn: String = ""): DataFrame = {
    val weighted = weightColumn.nonEmpty && df.columns.contains(weightColumn)
    val keyCols = df.columns.filterNot(c => c == "value" || (weighted && c == weightColumn))
    val bucketed = df.withColumn("timestamp", normalizeTime(col("timestamp"), timeRes))
    val keys = keyCols.map(col).toSeq

    if (!weighted) {
      bucketed
        .groupBy(keys: _*)
        .agg(sum("value").as("t_sum"), avg("value").as("t_mean"))
    } else {
      bucketed
        .groupBy(keys: _*)
        .agg(
          sum("value").as("t_sum"),
          avg("value").as("t_mean"),
          sum(col("value") * col(weightColumn)).as("_weighted_value"),
          sum(col(weightColumn)).as("_weight_sum"),
          avg(col(weightColumn)).as(weightColumn)
        )
        .withColumn("t_wavg", col("_weighted_value") / col("_weight_sum"))
        .drop("_weighted_value", "_weight_sum")
    }
  }
}
