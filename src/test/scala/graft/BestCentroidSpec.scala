package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Equivalence of the native codegen'd [[graft.functions.BestCentroid]]
  * argmax and the broadcast-join `max(struct(cos, -cent_id))`
  * formulation it replaced — asserted on both codegen paths over hand
  * vectors (exact ties, zero norms, short vectors) and the sf0.001
  * embeddings corpus, in both comparison modes (raw dot for unit
  * inputs, full cosine for raw inputs).
  */
class BestCentroidSpec extends SparkSpec {

  /** The replaced formulation: explode each vector against every
    * centroid, keep the max-cosine (or max-dot) id, ties to the
    * smallest cent_id. */
  private def joinArgmax(
      vecs: DataFrame, cents: Seq[Seq[Double]], normalize: Boolean): Map[Long, Int] = {
    val centDf = spark.createDataFrame(
      cents.zipWithIndex.map { case (v, i) => (i, v) }).toDF("cent_id", "centv")
    val score =
      if (normalize) graft.operators.Similarity.cosine("v", "centv")
      else call_function("vec_dot", col("v"), col("centv"))
    vecs.join(broadcast(centDf))
      .withColumn("s", score)
      .groupBy("id")
      .agg(max(struct(col("s"), (-col("cent_id")).as("neg"))).as("m"))
      .select(col("id"), (-col("m.neg")).cast("int").as("cent_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  private def nativeArgmax(
      vecs: DataFrame, cents: Seq[Seq[Double]], normalize: Boolean): Map[Long, Int] = {
    graft.plans.GraftExtensions.register(spark)
    vecs.select(col("id"),
        call_function("best_centroid", col("v"), typedLit(cents), lit(normalize))
          .as("cent_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  private def parityOn(wholeStage: Boolean): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, wholeStage.toString)
    try {
      // hand vectors: an exact two-centroid tie (must pick the lower id),
      // a zero-norm vector (NaN cosines everywhere under normalize →
      // index 0), a shorter-than-centroid vector (common-prefix dot)
      val hand = df("id LONG, v ARRAY<DOUBLE>", Seq(
        Row(1L, Seq(1.0, 1.0)), Row(2L, Seq(0.0, 0.0)),
        Row(3L, Seq(1.0)), Row(4L, Seq(-1.0, 0.0)), Row(5L, Seq(0.3, 0.9))))
      val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-0.7, 0.1))
      for (normalize <- Seq(true, false)) {
        val n = nativeArgmax(hand, cents, normalize)
        assert(n === joinArgmax(hand, cents, normalize), s"normalize=$normalize")
        // the (1,1) vector ties centroids 0 and 1 exactly — lower id wins
        assert(n(1L) === 0)
      }
      // zero-norm vector under normalize: every cosine is NULL/NaN on
      // both formulations; the contract collapses to cent_id 0
      assert(nativeArgmax(hand, cents, normalize = true)(2L) === 0)

      // corpus: raw embeddings against 7 centroids drawn from the corpus
      // itself, both modes
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      val corpusCents = emb.orderBy("id").limit(7)
        .collect().map(_.getSeq[Double](1).toSeq).toSeq
      for (normalize <- Seq(true, false)) {
        val n = nativeArgmax(emb, corpusCents, normalize)
        assert(n === joinArgmax(emb, corpusCents, normalize), s"corpus normalize=$normalize")
        assert(n.values.toSet.size > 1)
      }
    } finally spark.conf.set(key, prev)
  }

  test("native best_centroid == join argmax witness (whole-stage codegen)") {
    parityOn(wholeStage = true)
  }

  test("native best_centroid == join argmax witness (interpreted, no codegen)") {
    parityOn(wholeStage = false)
  }
}
