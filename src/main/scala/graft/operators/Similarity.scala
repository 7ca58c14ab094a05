package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path.
  *
  * Scale design:
  *  - cosine is a higher-order `zip_with`+`aggregate` expression — codegen'd,
  *    no UDF;
  *  - brute force broadcasts the (small) query set against the corpus: one
  *    pass over the big side, partial top-k per partition via a
  *    (query, partition) pre-window, final top-k over survivors — the same
  *    two-phase shape as any scale-safe top-k;
  *  - the LSH variant buckets vectors by the sign pattern of `numPlanes`
  *    deterministic pseudo-random hyperplanes; candidates only meet within a
  *    bucket (multi-probe / repetition are the standard recall knobs and
  *    compose by unioning bucket ids).
  */
object Similarity {

  /** Cosine similarity of two array<double> columns (names), as a codegen'd
    * fold: dot / (||a|| * ||b||). Deterministic left-to-right summation. */
  def cosineSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  def cosine(a: String, b: String): Column = expr(cosineSql(a, b))

  /** Deterministic pseudo-random hyperplane component for (plane i, dim d):
    * an exact-in-double rational in [-0.5, 0.5) derived from a Knuth
    * multiplicative hash — identical across engines, no RNG state. */
  def planeComponentSql(i: String, d: String, dims: Int): String =
    s"(CAST((($i * $dims + $d) * 2654435761) % 1000 AS DOUBLE) / 1000.0 - 0.5)"

  /** LSH bucket id: integer from the sign bits of the dot products with
    * `numPlanes` hyperplanes. Pure per-row expression. */
  def lshBucket(vecCol: String, dims: Int, numPlanes: Int): Column =
    expr(
      s"""aggregate(
         |  transform(sequence(0, ${numPlanes - 1}), i ->
         |    IF(aggregate(
         |         zip_with(`$vecCol`,
         |                  transform(sequence(0, ${dims - 1}), d -> ${planeComponentSql("i", "d", dims)}),
         |                  (x, p) -> x * p),
         |         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) >= 0.0,
         |       shiftleft(1, i), 0)),
         |  0, (s, v) -> s + v)""".stripMargin)

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), ranked by (rounded score desc, id).
    * Returns (query_id, rank, neighbor_id, cosine). */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine("qv", "cv"), 4))
    // two-phase top-k: per-partition survivors first, then the real rank
    val ord = Seq(col("cosine").desc, col("neighbor_id").asc)
    val pre = Window.partitionBy(col("query_id"), spark_partition_id()).orderBy(ord: _*)
    val fin = Window.partitionBy(col("query_id")).orderBy(ord: _*)
    scored
      .withColumn("_rn0", row_number().over(pre)).filter(col("_rn0") <= k).drop("_rn0")
      .withColumn("rank", row_number().over(fin)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** LSH-bucketed ANN top-k: like [[bruteForceTopK]] but candidates are
    * restricted to the query's hyperplane bucket. Trades recall for a
    * corpus-partitionable plan: at 100 TB the bucket id is a shuffle key,
    * not a broadcast — each bucket's candidates co-locate. */
  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dims: Int,
      numPlanes: Int = 16
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      lshBucket(vecCol, dims, numPlanes).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"),
      lshBucket(vecCol, dims, numPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine("qv", "cv"), 4))
    val fin = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(fin)).filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
