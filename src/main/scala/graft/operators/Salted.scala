package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew (hot-key) handling for aggregations at 100 TB (SURVEY §7.5).
  *
  * For ALGEBRAIC aggregates (sum/avg/count/min/max — the whole A1/A2
  * matrix) Spark's hash aggregation is already two-phase: map-side partial
  * aggregation reduces every task to ≤ one row per key before the shuffle,
  * so a hot key costs the final reducer at most (#map tasks) rows — no
  * salting needed, and adding one would only add a shuffle.
  *
  * The real skew risk is HOLISTIC aggregates whose partial state grows with
  * the group — `collect_set`/`collect_list` (A14/A16 region and qualifier
  * lists): one reducer materializes a hot feature's entire distinct set.
  * [[saltedCollectSet]] splits that state across `buckets` reducers and
  * merges: groupBy (keys, salt) collecting partial sets, then groupBy keys
  * flattening + dedup. Same result, bounded per-task state.
  */
object Salted {

  /** `collect_set(valueCol)` per key, with the set accumulation spread over
    * `buckets` reducers. Output: keys + `values` (array, order-undefined —
    * sort downstream if needed). */
  def saltedCollectSet(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      buckets: Int = 32
  ): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(col(valueCol)), lit(buckets)))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(collect_set(col(valueCol)).as("_partial"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(flatten(collect_list(col("_partial"))).as("values"))
      // partials are disjoint (salt = hash(value) % buckets), so flatten
      // alone is already a set — array_distinct kept as cheap insurance
      .withColumn("values", array_distinct(col("values")))
  }

  /** Salted distinct count: exact, via the same disjoint-partition trick —
    * sum of per-salt-bucket distinct counts. One extra narrow aggregation
    * instead of one reducer holding the whole distinct set. */
  def saltedCountDistinct(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      buckets: Int = 32
  ): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(col(valueCol)), lit(buckets)))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(countDistinct(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("n_distinct"))
  }
}
