package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TF-IDF keyword extraction: the top-k terms of each document scored by
  * term frequency x smoothed inverse document frequency — the standard
  * cheap relevance signal for corpus search, tagging, and topic drift
  * monitoring.
  *
  * idf uses the smoothed form ln((N + 1) / (df + 1)) + 1, so terms
  * appearing in every document still score positively and nothing divides
  * by zero.
  *
  * Plan shape: one hash aggregation for per-(doc, term) counts, one for
  * per-term document frequencies, a join on the term to attach idf, and a
  * ranking window PARTITIONED BY doc_id — a high-cardinality key, so the
  * sort is per-document-sized and spreads evenly (never the 3-value
  * window-partition scale trap). The term join shuffles on the vocabulary;
  * vocabularies grow sub-linearly with corpus size (Heaps' law), so the
  * df side stays small relative to the corpus and broadcasts when it fits.
  */
object Keywords {

  /** Per-document top-k terms. Returns
    * (doc_id, rank, term, tf, score) with score rounded to 4 decimals. */
  def topTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val n = docs.count()
    val terms = docs
      .select(col(idCol).as("doc_id"), explode(TextFunctions.tokens(textCol)).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("idf", log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df.select("term", "idf"), "term")
      .withColumn("score", round(col("tf") * col("idf"), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "score")
  }
}
