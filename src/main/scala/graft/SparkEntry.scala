package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schema
import graft.operators.{Regions, Spatial, Temporal, TileMath}
import graft.testbed.Datacube

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator from SURVEY.md §2 against
  * the driver's TPC-H-ish parquet tables (mapped onto the datacube schema by
  * [[graft.testbed.Datacube]]); `oracleSql` holds the equivalent DuckDB SQL.
  * Keys are prefixed with the SURVEY §2 operator id they cover.
  *
  * Determinism for the hash compare: measures are integer-valued (exact in
  * doubles), ratio-valued outputs are rounded to 4 decimals on both sides,
  * and every query ends in an ORDER BY on its keys.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full monthly global-timeseries slice (ingest → temporal agg →
    * spatial agg), SURVEY §7.2. */
  def entry(spark: SparkSession): DataFrame =
    globalTimeseries(spark, "/root/testdata/sf0.001", "month")

  // ---- shared helpers -----------------------------------------------------

  private def round4(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), 4)))

  /** Temporally-aggregated cube (A1): group by all non-value cols at the
    * given resolution. */
  private def temporalCube(spark: SparkSession, dir: String, timeRes: String,
                           weighted: Boolean = false): DataFrame = {
    val cube0 = Datacube(spark, dir)
    val cube = if (weighted) cube0 else cube0.drop("weight")
    Temporal.aggregate(cube, timeRes, if (weighted) "weight" else "")
  }

  /** DuckDB SQL mirror of [[temporalCube]] as a CTE named `t`. */
  private def temporalCubeSql(timeRes: String, weighted: Boolean = false): String = {
    val bucket = Datacube.sqlBucket("\"timestamp\"", timeRes)
    val keys = "country, admin1, admin2, admin3, lat, lng, feature, qual1"
    if (!weighted)
      s"""${Datacube.sqlCte},
         | t AS (
         |  SELECT $bucket AS "timestamp", $keys,
         |         SUM("value") AS t_sum, AVG("value") AS t_mean
         |  FROM cube GROUP BY ALL
         | )""".stripMargin
    else
      s"""${Datacube.sqlCte},
         | t AS (
         |  SELECT $bucket AS "timestamp", $keys,
         |         SUM("value") AS t_sum, AVG("value") AS t_mean,
         |         AVG(weight) AS weight,
         |         SUM("value" * weight) / SUM(weight) AS t_wavg
         |  FROM cube GROUP BY ALL
         | )""".stripMargin
  }

  private def globalTimeseries(spark: SparkSession, dir: String, timeRes: String): DataFrame = {
    val (agg, aggCols) =
      Spatial.aggregate(temporalCube(spark, dir, timeRes), Seq("feature", "timestamp"), Seq("sum", "mean"))
    round4(agg, aggCols.filterNot(_ == "s_count"))
      .orderBy("feature", "timestamp")
  }

  private def globalTimeseriesSql(timeRes: String): String =
    s"""${temporalCubeSql(timeRes)}
       |SELECT feature, "timestamp",
       |       ROUND(SUM(t_sum), 4)  AS s_sum_t_sum,
       |       ROUND(AVG(t_sum), 4)  AS s_mean_t_sum,
       |       ROUND(SUM(t_mean), 4) AS s_sum_t_mean,
       |       ROUND(AVG(t_mean), 4) AS s_mean_t_mean,
       |       COUNT(t_mean)         AS s_count
       |FROM t GROUP BY feature, "timestamp"
       |ORDER BY feature, "timestamp"""".stripMargin

  // ---- query inventory ----------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 + P12: temporal aggregation at month resolution (all keys kept)
    "a1_temporal_month" -> ((s, dir) => {
      temporalCube(s, dir, "month")
        .withColumn("t_mean", round(col("t_mean"), 4))
        .orderBy("feature", "timestamp", "country", "admin1", "admin2", "lat", "lng", "qual1")
    }),
    // A1 + P12 "all": everything under timestamp 0
    "a1_temporal_all" -> ((s, dir) => {
      temporalCube(s, dir, "all")
        .withColumn("t_mean", round(col("t_mean"), 4))
        .orderBy("feature", "country", "admin1", "admin2", "lat", "lng", "qual1")
    }),
    // A1 weighted: t_wavg = sum(v*w)/sum(w), weight → group mean
    "a1_temporal_weighted" -> ((s, dir) => {
      temporalCube(s, dir, "year", weighted = true)
        .withColumn("t_mean", round(col("t_mean"), 4))
        .withColumn("t_wavg", round(col("t_wavg"), 4))
        .withColumn("weight", round(col("weight"), 4))
        .orderBy("feature", "timestamp", "country", "admin1", "admin2", "lat", "lng", "qual1")
    }),
    // A2 + A4: global timeseries (the reference's minimum end-to-end slice)
    "a4_global_timeseries" -> ((s, dir) => globalTimeseries(s, dir, "month")),
    // A2 + A5 + P10: regional roll-up at admin1 with region_id concat
    "a5_regional_agg" -> ((s, dir) => {
      val t = Regions.withRegionId(temporalCube(s, dir, "month"), 1)
      val (agg, aggCols) =
        Spatial.aggregate(t, Seq("feature", "timestamp", "region_id"), Seq("sum", "mean"))
      round4(agg, aggCols.filterNot(_ == "s_count"))
        .orderBy("feature", "timestamp", "region_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "a1_temporal_month" ->
      s"""${temporalCubeSql("month")}
         |SELECT "timestamp", country, admin1, admin2, admin3, lat, lng, feature, qual1,
         |       t_sum, ROUND(t_mean, 4) AS t_mean
         |FROM t
         |ORDER BY feature, "timestamp", country, admin1, admin2, lat, lng, qual1""".stripMargin,
    "a1_temporal_all" ->
      s"""${temporalCubeSql("all")}
         |SELECT "timestamp", country, admin1, admin2, admin3, lat, lng, feature, qual1,
         |       t_sum, ROUND(t_mean, 4) AS t_mean
         |FROM t
         |ORDER BY feature, country, admin1, admin2, lat, lng, qual1""".stripMargin,
    "a1_temporal_weighted" ->
      s"""${temporalCubeSql("year", weighted = true)}
         |SELECT "timestamp", country, admin1, admin2, admin3, lat, lng, feature, qual1,
         |       t_sum, ROUND(t_mean, 4) AS t_mean,
         |       ROUND(weight, 4) AS weight, ROUND(t_wavg, 4) AS t_wavg
         |FROM t
         |ORDER BY feature, "timestamp", country, admin1, admin2, lat, lng, qual1""".stripMargin,
    "a4_global_timeseries" -> globalTimeseriesSql("month"),
    "a5_regional_agg" ->
      s"""${temporalCubeSql("month")},
         | r AS (SELECT *, country || '__' || admin1 AS region_id FROM t)
         |SELECT feature, "timestamp", region_id,
         |       ROUND(SUM(t_sum), 4)  AS s_sum_t_sum,
         |       ROUND(AVG(t_sum), 4)  AS s_mean_t_sum,
         |       ROUND(SUM(t_mean), 4) AS s_sum_t_mean,
         |       ROUND(AVG(t_mean), 4) AS s_mean_t_mean,
         |       COUNT(t_mean)         AS s_count
         |FROM r GROUP BY feature, "timestamp", region_id
         |ORDER BY feature, "timestamp", region_id""".stripMargin
  )
}
