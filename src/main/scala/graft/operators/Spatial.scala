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
  /** The `s_{agg}_t_{tagg}` matrix shared by [[aggregate]] and
    * [[aggregateLevels]]: aggregation expressions, the canonical output
    * column order, and the wavg post-projection. */
  private def aggMatrix(
      df: DataFrame, spatialAggs: Seq[String], weightColumn: String
  ): (Seq[Column], Seq[String], DataFrame => DataFrame) = {
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

    val aggColumns =
      aggs.map(a => s"s_${a}_t_sum") ++
        aggs.map(a => s"s_${a}_t_mean") ++ Seq("s_count") ++
        (if (weighted)
           aggs.map(a => s"s_${a}_t_wavg") ++
             Seq("s_wavg_t_sum", "s_wavg_t_mean", "s_wavg_t_wavg")
         else Seq.empty)

    val post: DataFrame => DataFrame =
      if (!weighted) identity
      else
        _.withColumn("s_wavg_t_sum", col("_wsum_t_sum") / col("_s_weight"))
          .withColumn("s_wavg_t_mean", col("_wsum_t_mean") / col("_s_weight"))
          .withColumn("s_wavg_t_wavg", col("_wsum_t_wavg") / col("_s_weight"))
          .drop("_wsum_t_sum", "_wsum_t_mean", "_wsum_t_wavg", "_s_weight")

    (base ++ weightedAggs, aggColumns, post)
  }

  def aggregate(
      df: DataFrame,
      groupby: Seq[String],
      spatialAggs: Seq[String],
      weightColumn: String = ""
  ): (DataFrame, Seq[String]) = {
    val (allAggs, aggColumns, post) = aggMatrix(df, spatialAggs, weightColumn)
    val grouped = df.groupBy(groupby.map(col): _*).agg(allAggs.head, allAggs.tail: _*)
    (post(grouped), aggColumns)
  }

  /** Every requested region level in ONE shuffle via `GROUPING SETS`
    * (replacing the reference's per-level re-aggregation loop,
    * flows/data_pipeline.py:438-470: 4 admin levels = 4 passes over the
    * frame). Output rows carry `level` (0=country..) and the level's
    * `region_id` (`__`-joined ancestor chain, absent hierarchy columns as
    * the literal "None" — semantics of [[Regions.joinRegionColumns]]).
    *
    * The grouping-set id distinguishes levels, so data-borne "None"/null
    * region values can never be confused with rollup markers. All aggs in
    * the matrix are algebraic (sum/avg/count/min/max + weighted-sum
    * ratios), so partial aggregation still combines map-side; the shuffle
    * carries one partial row per (input partition, grouping set, key) —
    * strictly less than the per-level loop's repeated full scans.
    *
    * @param fixedKeys  keys common to every level (feature, timestamp, ...)
    * @param regionCols region columns PRESENT in df (for "None" filling)
    * @param levels     admin levels to produce (each 0..3)
    */
  def aggregateLevels(
      df: DataFrame,
      fixedKeys: Seq[String],
      regionCols: Seq[String],
      levels: Seq[Int],
      spatialAggs: Seq[String],
      weightColumn: String = ""
  ): (DataFrame, Seq[String]) = {
    require(levels.nonEmpty, "no region levels requested")
    val n = levels.max + 1
    // each level groups on its RENDERED region-id prefix (the "__"-joined
    // ancestor chain) — one string column per level, exactly the key the
    // per-level loop grouped on, so region values that themselves contain
    // the delimiter collapse identically (grouping on the raw parts would
    // split "A__B" + "C" from "A" + "B__C")
    val prefixNames = (0 until n).map(j => s"_rid$j")
    val withPrefixes = (0 until n).foldLeft(df) { (d, j) =>
      d.withColumn(prefixNames(j), Regions.joinRegionColumns(regionCols, j))
    }
    val fixedC = fixedKeys.map(col)
    val sets = levels.map(l => fixedC :+ col(prefixNames(l)))
    val (allAggs, aggColumns, post) = aggMatrix(withPrefixes, spatialAggs, weightColumn)
    // grouping_id bit j (prefix column j, MSB-first after the always-
    // grouped fixed keys): level l ⇒ only bit l is CLEAR
    def gidFor(l: Int): Long = ((1L << n) - 1) & ~(1L << (n - 1 - l))
    val levelExpr = levels.tail
      .foldLeft(when(grouping_id() === lit(gidFor(levels.head)), lit(levels.head))) {
        (acc, l) => acc.when(grouping_id() === lit(gidFor(l)), lit(l))
      }
    val grouped = withPrefixes
      .groupingSets(sets, (fixedC ++ prefixNames.map(col)): _*)
      .agg(allAggs.head, (allAggs.tail :+ levelExpr.as("level")): _*)
    val out = post(grouped)
      // exactly one prefix column is non-null per output row (its level's)
      .withColumn("region_id", coalesce(prefixNames.reverse.map(col): _*))
      .drop(prefixNames: _*)
    (out, aggColumns)
  }
}
