package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding merge induction — the tokenizer-vocabulary
  * learning pass of a training-data pipeline (the SentencePiece/HF
  * `train()` step), distributed the way BPE actually scales:
  *
  *  - the CORPUS is touched exactly once, to build the word-frequency
  *    table (Heaps'-law-bounded — this is the object BPE iterates on;
  *    every classic implementation does the same reduction);
  *  - each merge round is ONE pair-count aggregation over that table
  *    plus a 1-row argmax collect (the merge rule is metadata), and the
  *    merge applies as a per-word string rewrite — no corpus rescan.
  *
  * Symbol-sequence encoding (the part both engines must agree on
  * bit-for-bit): a word's symbols are joined with TWO spaces and the
  *    whole string padded with one space each side, so the pair
  *    `(a, b)` is the literal substring ` a  b ` and a left-to-right
  *    non-overlapping `replace( a  b , ab )` implements exactly BPE's
  *    greedy-left merge application (each match consumes one of the two
  *    separator spaces on each side, so back-to-back pairs still
  *    match). Pair counting is positional (adjacent positions,
  *    overlapping occurrences counted — the standard BPE statistic),
  *    weighted by word frequency; ties break (count DESC, a ASC,
  *    b ASC).
  *
  * Returns the merge table (round, a, b, pair_count) — `rounds` rows
  * (fewer if the table runs out of pairs). */
object Bpe {

  /** The double-space symbol encoding of a word: one symbol per
    * character. `regexp_replace(w, '(.)', '$1  ')` then trim. */
  private def charSyms(wordCol: String) =
    trim(regexp_replace(col(wordCol), "(.)", "$1  "))

  def learnMerges(
      docs: DataFrame,
      textCol: String,
      rounds: Int
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = docs
      .select(explode(TextFunctions.tokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("s", charSyms("word"))
      .select("s", "freq")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var syms = wf
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val best = syms
        .select(col("freq"), split(col("s"), "  ").as("l"))
        // single-symbol words carry no pairs (and Spark's sequence(1, 0)
        // DESCENDS rather than being empty — it must not be reached)
        .filter(size(col("l")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(1), size(col("l")) - 1),
            i => struct(element_at(col("l"), i).as("a"),
              element_at(col("l"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.nonEmpty) {
        val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, a, b, cnt))
        syms = syms.withColumn("s",
          trim(replace(concat(lit(" "), col("s"), lit(" ")),
            lit(s" $a  $b "), lit(s" ${a + b} "))))
      }
    }
    wf.unpersist(blocking = false)
    merges.result().toDF("round", "a", "b", "pair_count")
  }

  /** Apply a learned merge table to text: per-word greedy-left
    * application of the merges in order; returns (original columns…,
    * bpe_tokens array). The rewrite chain is k literal replaces — pure
    * codegen, corpus-scan speed. */
  def applyMerges(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]
  ): DataFrame =
    docs.withColumn("bpe_tokens", expr(buildApplySql(textCol, merges)))

  /** SQL-expression form of the merge chain over each token. */
  private def buildApplySql(textCol: String, merges: Seq[(String, String)]): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    val chain = merges.foldLeft(
      s"trim(regexp_replace(w, '(.)', '$$1  '))") { case (acc, (a, b)) =>
      s"trim(replace(concat(' ', $acc, ' '), ' ${esc(a)}  ${esc(b)} ', ' ${esc(a + b)} '))"
    }
    s"flatten(transform(${TextFunctions.toksSql(textCol)}, w -> split($chain, '  ')))"
  }
}
