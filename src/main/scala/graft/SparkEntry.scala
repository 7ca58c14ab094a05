package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.testbed.{DatacubeQueries, DocQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the testbed query batteries, one entry per
  * operator from SURVEY.md §2 (keys carry the §2 id); `oracleSql` holds the
  * equivalent DuckDB SQL for the hash-compare gate. Column names are aliased
  * identically on both sides; ratio-valued doubles are rounded to 4 decimals
  * on both sides; measures are integer-valued so sums are exact in doubles.
  */
object SparkEntry {

  type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full monthly global-timeseries slice (ingest → validate → temporal
    * agg → spatial agg), SURVEY §7.2. */
  def entry(spark: SparkSession): DataFrame =
    DatacubeQueries.globalTimeseries(spark, "/root/testdata/sf0.001", "month")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    DatacubeQueries.queries ++ DocQueries.queries

  def oracleSql: Map[String, String] =
    DatacubeQueries.oracles ++ DocQueries.oracles
}
