package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Equivalence of the native codegen'd [[graft.functions.BucketPairs]]
  * scorer and the nested higher-order-lambda formulation it replaced
  * ([[Dedup.bucketPairsLambda]], kept exactly as this test's witness) —
  * asserted on both codegen paths over hand-built buckets (boundary
  * cosines, zero-norm vectors, singleton and empty-adjacent buckets)
  * plus the sf0.001 embeddings corpus bucketed by a hash key.
  */
class BucketPairsSpec extends SparkSpec {

  private def grouped(in: DataFrame, buckets: Int): DataFrame =
    in.select(col("id"), col("v").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
      .withColumn("g", col("id") % buckets)
      .groupBy("g")
      .agg(sort_array(collect_list(struct(col("id"), col("v"), col("nrm")))).as("xs"))

  private def pairs(d: DataFrame): Set[(Long, Long, Double)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def parityOn(wholeStage: Boolean): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, wholeStage.toString)
    try {
      graft.plans.GraftExtensions.register(spark)
      // hand bucket: identical vectors (cosine 1), opposite (-1), a
      // zero-norm vector (pairs with it must drop), a rounding-boundary
      // neighborhood
      val hand = df("id LONG, v ARRAY<DOUBLE>", Seq(
        Row(1L, Seq(1.0, 0.0)), Row(2L, Seq(1.0, 0.0)),
        Row(3L, Seq(-1.0, 0.0)), Row(4L, Seq(0.0, 0.0)),
        Row(5L, Seq(1.0, 0.015)), Row(6L, Seq(0.7, 0.7))))
      for (minCos <- Seq(-1.0, 0.0, 0.7, 0.99995)) {
        val g = grouped(hand, 1)
        assert(pairs(Dedup.bucketPairsNative(g, minCos))
          === pairs(Dedup.bucketPairsLambda(g, minCos)), s"minCos=$minCos")
      }
      // no pair involving the zero-norm id 4 ever appears
      val all = pairs(Dedup.bucketPairsNative(grouped(hand, 1), -1.0))
      assert(all.nonEmpty && !all.exists(p => p._1 == 4L || p._2 == 4L))

      // corpus: every embedding, hash-bucketed
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("v"))
      val g = grouped(emb, 11)
      val n = pairs(Dedup.bucketPairsNative(g, 0.2))
      assert(n === pairs(Dedup.bucketPairsLambda(g, 0.2)))
      assert(n.nonEmpty)
    } finally spark.conf.set(key, prev)
  }

  test("native bucket_pairs == lambda witness (whole-stage codegen)") {
    parityOn(wholeStage = true)
  }

  test("native bucket_pairs == lambda witness (interpreted, no codegen)") {
    parityOn(wholeStage = false)
  }
}
