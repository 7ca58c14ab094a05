package graft.testbed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maps the driver's TPC-H-ish tables onto the engine's datacube input
  * schema (`timestamp, country, admin1..3, lat, lng, feature, value,
  * qualifier, weight`) so every datacube operator can be exercised against
  * the DuckDB oracle on the same parquet files (FIXTURES.md §6).
  *
  * The Spark plan and the `sqlCte` text below must stay semantically
  * identical — the driver hash-compares their results.
  *
  * Scale note: supplier/nation/region are tiny dimensions → broadcast joins
  * (no shuffle); lat/lng are deterministic arithmetic on keys so the whole
  * mapping is a narrow, codegen'd projection over the lineitem scan.
  */
object Datacube {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The datacube frame: one row per lineitem with geo/feature columns. */
  def apply(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val sup = table(spark, dir, "supplier")
    val nat = table(spark, dir, "nation")
    val reg = table(spark, dir, "region")
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(
        unix_millis(col("l_shipdate").cast("timestamp")).as("timestamp"),
        col("r_name").as("country"),
        col("n_name").as("admin1"),
        col("s_name").as("admin2"),
        lit("None").as("admin3"),
        ((col("l_partkey") % 140 - 70).cast("double") + lit(0.25)).as("lat"),
        ((col("l_orderkey") % 360 - 180).cast("double") + lit(0.25)).as("lng"),
        col("l_returnflag").as("feature"),
        // Integer-valued measures: sums of integers are exact in IEEE
        // doubles, so aggregate results are bit-identical across engines
        // regardless of summation order (the oracle hash-compares values).
        col("l_quantity").as("value"),
        col("l_linestatus").as("qual1"),
        (round(col("l_discount") * 100) + lit(1.0)).as("weight")
      )
  }

  /** DuckDB CTE producing the identical frame; prefix for oracle SQL. */
  val sqlCte: String =
    """WITH cube AS (
      |  SELECT epoch_ms(l_shipdate) AS "timestamp",
      |         r_name AS country, n_name AS admin1, s_name AS admin2,
      |         'None' AS admin3,
      |         CAST((l_partkey % 140) - 70 AS DOUBLE) + 0.25 AS lat,
      |         CAST((l_orderkey % 360) - 180 AS DOUBLE) + 0.25 AS lng,
      |         l_returnflag AS feature,
      |         l_quantity AS "value",
      |         l_linestatus AS qual1,
      |         ROUND(l_discount * 100) + 1.0 AS weight
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |)""".stripMargin

  /** DuckDB SQL bucketing an epoch-ms expression to month/year start (P12).
    * `make_timestamp` takes microseconds; the cube timestamps are UTC ms. */
  def sqlBucket(epochMsExpr: String, timeRes: String): String = timeRes match {
    case "month" | "year" =>
      s"epoch_ms(date_trunc('$timeRes', make_timestamp($epochMsExpr * 1000)))"
    case "all" => "CAST(0 AS BIGINT)"
  }
}
