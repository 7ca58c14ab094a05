package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** Golden semantics for the in-engine logistic quality classifier:
  * hand-computed feature fixture, convergence on a separable corpus,
  * constant-feature pinning, and margin-sign determinism across both
  * codegen paths (the t30/t31 battery entries ride on all four).
  */
class ClassifierSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) =
    df("doc_id BIGINT, text STRING", rows.map(r => Row(r._1, r._2)))

  // ---- feature fixture ----------------------------------------------------

  test("features: hand-computed 6-vector for a known sentence") {
    // "the cat sat on the mat": 6 tokens, 5 types, norm length 22,
    // 3 stopwords (the/on/the), zero punctuation.
    //   x0 bias            = 1.0
    //   x1 len saturation  = min(6,100)/100            = 0.06
    //   x2 ttr             = round(5/6, 4)             = 0.8333
    //   x3 avg token len   = round((22-5)/6, 4) / 10   = 0.28333
    //   x4 punct ratio     = 0.0
    //   x5 stopword ratio  = round(3/6, 4)             = 0.5
    val d = docs(Seq(1L -> "the cat sat on the mat"))
    val x = d.select(Classifier.features("text").as("x"))
      .head().getSeq[Double](0)
    // x3 is the double quotient 2.8333/10.0 exactly as the engine computes it
    assert(x === Seq(1.0, 0.06, 0.8333, 2.8333 / 10.0, 0.0, 0.5))
  }

  // ---- separable corpus ---------------------------------------------------

  /** 40 gate-passing docs (25 tokens, clean prose shape) and 40 gate-
    * failing docs (5 tokens — fails the min-length rule), far apart in
    * feature space so full-batch GD must drive every margin sign to its
    * weak label. */
  private def separable = {
    val good = (0 until 40).map { i =>
      // 25 tokens, ttr 1.0, stopword ratio 2/25, avg token len ~5
      // (tokens "w39x22" are 4-6 chars, inside the [3,6] gate): keep=true
      val uniq = (0 until 23).map(j => s"w${i}x$j").mkString(" ")
      (i.toLong, s"the $uniq for")
    }
    val bad = (40 until 80).map { i =>
      (i.toLong, s"a$i b$i c$i d$i e$i")
    }
    docs(good ++ bad)
  }

  test("trainLogistic converges on a separable corpus") {
    val d = separable
    val m = Classifier.trainLogistic(d, "text", iters = 8, lr = 4.0)
    val scored = Classifier.scoreLogistic(d, "doc_id", "text", m)
    val wrong = scored.filter(col("predicted") =!= col("label")).count()
    assert(wrong === 0L)
    // and the confusion table carries exactly the two diagonal cells
    val conf = Classifier.confusion(scored).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(conf === Map((false, false) -> 40L, (true, true) -> 40L))
  }

  // ---- constant-feature pinning -------------------------------------------

  test("constant feature gets sd=0 sentinel, stays at weight 0") {
    // every doc has zero punctuation -> x4 variance is exactly 0; the
    // standardized x4 must pin to 0 (not 1/sqrt(eps) noise) and its
    // weight must never move off 0.
    val m = Classifier.trainLogistic(separable, "text", iters = 4, lr = 4.0)
    assert(m.sd(4) === 0.0)
    assert(m.w(4) === 0.0)
    // non-constant features did train
    assert(m.w(1) !== 0.0)
  }

  // ---- margin-sign determinism across codegen paths -----------------------

  test("scoreLogistic is bit-identical with and without whole-stage codegen") {
    val d = separable
    val m = Classifier.trainLogistic(d, "text", iters = 8, lr = 4.0)
    def run(): Seq[Row] =
      Classifier.scoreLogistic(d, "doc_id", "text", m)
        .orderBy("doc_id").collect().toSeq
    val key = "spark.sql.codegen.wholeStage"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "true")
      val gen = run()
      spark.conf.set(key, "false")
      val interp = run()
      assert(gen === interp)
    } finally spark.conf.set(key, saved)
  }

  // ---- training is deterministic under repartition ------------------------

  test("model is identical regardless of input partitioning") {
    val d = separable
    val m1 = Classifier.trainLogistic(d, "text", iters = 4, lr = 4.0)
    val m2 = Classifier.trainLogistic(d.repartition(7), "text", iters = 4, lr = 4.0)
    assert(m1.mu.toSeq === m2.mu.toSeq)
    assert(m1.sd.toSeq === m2.sd.toSeq)
    assert(m1.w.toSeq === m2.w.toSeq)
  }
}
