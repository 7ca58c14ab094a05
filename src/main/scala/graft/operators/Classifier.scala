package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** In-engine quality-classifier training — the fastText-style model of
  * the published LLM curation pipelines (GPT-3 / CCNet / RefinedWeb all
  * train a cheap classifier to imitate an expensive quality signal and
  * then score the whole corpus with it), re-expressed as Spark
  * aggregations. Reference behavior: the curation stage of
  * uncharted-causemos/slow-tortoise's document flows (quality gating
  * before aggregation); the trainable scorer generalizes its static
  * threshold gate.
  *
  * Shape: one standardization pass (per-feature mean/variance), then
  * full-batch logistic-regression gradient descent where each iteration
  * is ONE map-side-combinable aggregation over the corpus producing the
  * 6-number gradient — the model is driver-side metadata like the
  * k-means centroids, and scoring is a pure codegen'd projection. At
  * 100 TB: training cost = (1 + iters) corpus scans with a handful-of-
  * values combine each (no exchange wider than the agg), scoring cost =
  * the scan itself; nothing row-sized ever collects.
  *
  * Cross-engine determinism contract (what makes the DuckDB mirror
  * hash-exact): every corpus sum — feature means, second moments, and
  * per-iteration gradient contributions — is quantized per row to 1e-8
  * fixed-point and summed as EXACT int64 (the scaled-int-sums pattern of
  * the t19/v5 oracles), so float-summation order, Spark partitioning,
  * and libm ulp drift all vanish at the quantization grain; the weight
  * vector is a pure function of exact integers and both engines walk
  * bit-identical weights. Features are the ROUNDED text-stats surface
  * ([[TextFunctions.textStats]], already oracle-matched by t1); the weak
  * label is the UNROUNDED Gopher gate ([[TextFunctions.qualityFilter]],
  * oracle-matched by t15). The decision boundary compares the raw
  * margin `z >= 0` (bit-identical both sides), never the rounded
  * probability.
  */
object Classifier {

  /** Fixed-point grain for the exact corpus sums. */
  val GradScale = 1.0e8

  /** Variance at or below this is treated as a constant feature (its
    * standardized value is pinned to 0 so it cannot inject 1/sqrt(eps)
    * noise; the bias carries any constant signal). */
  val VarFloor = 1.0e-12

  val featureNames: Seq[String] =
    Seq("bias", "len_sat", "ttr", "avg_len", "punct", "stopword")

  private val NumFeatures = featureNames.length

  /** Trained model: per-feature standardization (mu, sd — sd == 0.0 is
    * the constant-feature sentinel, bias slots are identity) and the
    * weight vector. Pure metadata — broadcastable by value into any
    * scoring projection. */
  final case class LogisticModel(
      mu: Array[Double], sd: Array[Double], w: Array[Double])

  /** The 6-feature vector: bias, length saturation (min(n_tokens,100)/100),
    * and the four rounded text-stat ratios (avg token length scaled to
    * ~[0,1]). All derived from the single shared stats definition, so a
    * tokenizer change cannot desynchronize classifier and oracle. */
  def features(c: String): Column = {
    val ts = TextFunctions.textStats(c)
    array(
      lit(1.0),
      least(ts.getField("n_tokens"), lit(100)).cast("double") / 100.0,
      ts.getField("ttr"),
      ts.getField("avg_token_len") / 10.0,
      ts.getField("punct_ratio"),
      ts.getField("stopword_ratio"))
  }

  /** Weak label: the Gopher-style gate's `keep` as 1.0/0.0 — the
    * expensive-signal stand-in the classifier distills. */
  def weakLabel(c: String): Column =
    TextFunctions.qualityFilter(c).getField("keep").cast("double")

  /** Standardize a raw feature array with the model's mu/sd: bias stays
    * 1, constant features pin to 0, the rest z-score. Resolved to
    * literal arithmetic at plan time — scoring stays one codegen'd
    * projection. */
  private def standardize(x: Column, model: LogisticModel): Column =
    array((0 until NumFeatures).map { j =>
      if (j == 0) lit(1.0)
      else if (model.sd(j) == 0.0) lit(0.0)
      else (x.getItem(j) - lit(model.mu(j))) / lit(model.sd(j))
    }: _*)

  /** w·x as the left-associated sum b0*x0 + … + b5*x5 — the exact
    * association order the DuckDB mirror writes out, so the margin is
    * bit-identical across engines. */
  private def margin(w: Array[Double], x: Column): Column =
    w.zipWithIndex.map { case (wj, j) => lit(wj) * x.getItem(j) }.reduce(_ + _)

  /** One exact fixed-point corpus sum: Σ round(e·1e8) as int64. */
  private def fxSum(e: Column): Column =
    sum(round(e * lit(GradScale)).cast("long"))

  /** Standardization pass + full-batch GD from zero weights. Per
    * iteration: residual r = sigmoid(w·x) − y, gradient_j =
    * (Σ round(r·x_j·1e8)) / 1e8 / n (exact int64 sum — see the
    * determinism contract above), update w_j −= lr·gradient_j. */
  def trainLogistic(
      docs: DataFrame,
      textCol: String,
      iters: Int = 20,
      lr: Double = 4.0): LogisticModel = {
    val raw = docs
      .select(features(textCol).as("x"), weakLabel(textCol).as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val statAggs = (1 until NumFeatures).flatMap(j => Seq(
        fxSum(col("x").getItem(j)).as(s"m$j"),
        fxSum(col("x").getItem(j) * col("x").getItem(j)).as(s"q$j"))) :+
        count(lit(1)).as("n")
      val st = raw.agg(statAggs.head, statAggs.tail: _*).head()
      val n = st.getAs[Long]("n")
      val mu = Array.fill(NumFeatures)(0.0)
      val sd = Array.fill(NumFeatures)(1.0)
      if (n > 0) (1 until NumFeatures).foreach { j =>
        val m = (st.getAs[Long](s"m$j") / GradScale) / n
        val q = (st.getAs[Long](s"q$j") / GradScale) / n
        val v = q - m * m
        mu(j) = m
        sd(j) = if (v > VarFloor) math.sqrt(v) else 0.0
      }
      val model0 = LogisticModel(mu, sd, Array.fill(NumFeatures)(0.0))
      val sx = standardize(col("x"), model0)
      var w = Array.fill(NumFeatures)(0.0)
      for (_ <- 0 until iters if n > 0) {
        val r = lit(1.0) / (lit(1.0) + exp(-margin(w, sx))) - col("y")
        val aggs = (0 until NumFeatures).map(j =>
          fxSum(r * sx.getItem(j)).as(s"s$j")) :+ count(lit(1)).as("cnt")
        val row = raw.agg(aggs.head, aggs.tail: _*).head()
        w = Array.tabulate(NumFeatures)(j =>
          w(j) - lr * ((row.getAs[Long](s"s$j") / GradScale) / n))
      }
      LogisticModel(mu, sd, w)
    } finally { raw.unpersist(blocking = false); () }
  }

  /** Score the corpus with a trained model: (id, prob, predicted, label)
    * — `predicted` is the raw margin sign (z >= 0), `prob` the
    * 1e-4-rounded sigmoid, `label` the weak label the model was
    * distilled from (so downstream agreement metrics need no second
    * text pass).
    *
    * Two projections, deliberately: the feature array and weak label
    * are STAGED once per row, then the margin reads the staged array.
    * A single projection would let SimplifyExtractValueOps inline one
    * copy of the whole tokenizer tree per feature (textStats is a
    * CreateNamedStruct, so every getField splices its field's full
    * subtree), and the stopword-filter lambda blocks codegen CSE from
    * re-deduplicating them — measured ~6 tokenizer passes per row
    * (2.1 s → 0.3 s for 5 K docs). CollapseProject keeps the stage:
    * the array is non-cheap and referenced once per feature. */
  def scoreLogistic(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: LogisticModel): DataFrame = {
    val staged = docs.select(col(idCol),
      features(textCol).as("__x"), weakLabel(textCol).as("__y"))
    val z = margin(model.w, standardize(col("__x"), model))
    staged.select(
      col(idCol),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("prob"),
      (z >= 0.0).as("predicted"),
      (col("__y") >= 0.5).as("label"))
  }

  /** Confusion counts of the scored frame: (predicted, label, n) —
    * exact BIGINTs over the tiny 2×2 key space. */
  def confusion(scored: DataFrame): DataFrame =
    scored.groupBy("predicted", "label")
      .agg(count(lit(1)).as("n"))
      .orderBy("predicted", "label")
}
