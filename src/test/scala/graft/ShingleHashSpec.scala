package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Equivalence of the native codegen'd [[graft.functions.ShingleHash60]]
  * projection and the SQL formulation it replaced (explode the
  * higher-order-function shingle array, hash with the md5/conv
  * projection — reconstructed here exactly as the witness) — asserted on
  * both codegen paths over degenerate shapes plus the sf0.001 documents
  * corpus, as per-document multisets. The in-row `dedupHashes` mode must
  * equal the old frame-level `.distinct()`.
  */
class ShingleHashSpec extends SparkSpec {

  private val toks = "split(regexp_replace(trim(text), '\\\\s+', ' '), ' ')"

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "rep rep rep rep rep",                        // one distinct shingle
    "a b",                                        // < n tokens -> no shingles
    "",
    "  spaced   out   tokens   here  ",
    "unicode éèê tokens 中文 mixed grams")

  private def native(in: DataFrame, dedup: Boolean): Map[Long, Seq[Long]] = {
    graft.plans.GraftExtensions.register(spark)
    in.select(col("doc_id"), explode(call_function("shingle_hash60",
        expr(toks), lit(3), lit(dedup))).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
  }

  private def witness(in: DataFrame, dedup: Boolean): Map[Long, Seq[Long]] = {
    val sh = in.select(col("doc_id"), explode(Dedup.shingles("text", 3)).as("sstr"))
      .select(col("doc_id"), Dedup.shingleHash60(col("sstr")).as("s"))
    (if (dedup) sh.distinct() else sh)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
  }

  private def parityOn(wholeStage: Boolean): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, wholeStage.toString)
    try {
      val hand = df("doc_id LONG, text STRING",
        texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) })
      val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      for (in <- Seq(hand, corpus); dedup <- Seq(false, true)) {
        val n = native(in, dedup)
        assert(n === witness(in, dedup))
        assert(n.nonEmpty)
      }
    } finally spark.conf.set(key, prev)
  }

  test("randomized corpus parity: 300 seeded docs over a tiny alphabet") {
    val rnd = new scala.util.Random(20260813L)
    val alphabet = Vector("a", "bb", "ccc", "δ", "中", "x1", "y", "zz",
      "tok", "v2", "w", "qq")
    val docs = (0 until 300).map { i =>
      Row(i.toLong, Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" "))
    }
    val in = df("doc_id LONG, text STRING", docs)
    for (dedup <- Seq(false, true)) assert(native(in, dedup) === witness(in, dedup))
  }

  test("native shingle_hash60 == SQL witness (whole-stage codegen)") {
    parityOn(wholeStage = true)
  }

  test("native shingle_hash60 == SQL witness (interpreted, no codegen)") {
    parityOn(wholeStage = false)
  }
}
