package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and exact distribution statistics for
  * training-data curation: domain/language mixing needs per-stratum rates
  * that are (a) exactly reproducible across runs, engines and cluster
  * sizes — a training set must be re-derivable bit-for-bit from the raw
  * corpus — and (b) pure per-row decisions, so the sample is a codegen'd
  * filter at scan speed with no shuffle and no RNG state per partition
  * (Spark's `sample()`/`sampleBy()` are seed-stable only for a fixed
  * partitioning, which a 1000-executor re-run does not guarantee).
  */
object Sampling {

  /** Uniform [0, 1) decision value derived from the row's id: the first 15
    * md5 hex digits (60 bits) of `salt:id` scaled down. Content-addressed —
    * independent of partitioning, ordering, engine. */
  def hashUnit(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), idCol.cast("string"))), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 2^60

  /** Keep each row with its stratum's rate: rows where
    * hashUnit(id) < rate(stratum). Strata missing from `rates` get
    * `defaultRate`. Pure projection+filter — no shuffle, no state. */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      salt: String = "graft-sample"
  ): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashUnit(col(idCol), salt) < rate)
  }

  /** Exact per-group quantiles of `valueCol` at the given probabilities
    * (linear interpolation, the numpy/DuckDB `quantile_cont` definition).
    * One hash-agg shuffle on the group keys; `percentile` is a sort-based
    * holistic aggregate, so per-group state is O(group row count) — fine
    * for the intended use (per-language / per-domain corpus distributions,
    * thousands of groups), not for million-row groups where the t-digest
    * sketch (`percentile_approx`) is the scale path. */
  def exactQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      probs: Seq[Double],
      names: Seq[String]
  ): DataFrame = {
    require(probs.length == names.length, "one output name per probability")
    val aggs = probs.zip(names).map { case (p, n) =>
      percentile(col(valueCol), lit(p)).as(n)
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Approximate per-group quantiles via the Greenwald-Khanna sketch
    * (`approx_percentile`) — the 100 TB path: `percentile` materializes
    * and sorts every group's values inside the aggregation buffer, while
    * the sketch is one streaming pass with O(1/accuracy) state per group
    * and mergeable partials (map-side combine works). Rank error is
    * bounded by 1/accuracy of the group size; values are genuine data
    * points (no interpolation), so the result is engine-dependent —
    * verified against [[exactQuantiles]] within tolerance in
    * CurationOpsSpec, rows-only at the driver gate. */
  def approxQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      probs: Seq[Double],
      names: Seq[String],
      accuracy: Int = 10000
  ): DataFrame = {
    require(probs.length == names.length, "one output name per probability")
    val aggs = probs.zip(names).map { case (p, n) =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy)).as(n)
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
