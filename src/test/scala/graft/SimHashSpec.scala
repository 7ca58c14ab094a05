package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{SimHash60, TextFunctions}

/** Equivalence of the native codegen'd [[SimHash60]] expression and the
  * portable higher-order-lambda formulation it replaced
  * ([[TextFunctions.simHashLambda]], kept exactly as this test's witness) —
  * asserted on both the whole-stage-codegen and the interpreted/no-codegen
  * execution paths, over hand-picked degenerate shapes plus the sf0.001
  * documents corpus.
  */
class SimHashSpec extends SparkSpec {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the the the the repeated token majority",   // duplicates count (multiset)
    "single",
    "",                                          // normalizes to one empty token
    "  leading   and trailing   whitespace  ",
    "unicode éèê tokens 中文 mixed",
    "punctuation, kept! as-is? (tokens)",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z")

  private def parityOn(wholeStage: Boolean): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, wholeStage.toString)
    try {
      val in = df("doc_id LONG, text STRING",
        texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) })
      val rows = in.select(
        TextFunctions.simHash("text").as("native"),
        TextFunctions.simHashLambda("text").as("lambda")).collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
      assert(rows.map(_.getLong(0)).distinct.length > 1)
    } finally spark.conf.set(key, prev)
  }

  test("native simhash60 == lambda witness (whole-stage codegen)") {
    parityOn(wholeStage = true)
  }

  test("native simhash60 == lambda witness (interpreted, no codegen)") {
    parityOn(wholeStage = false)
  }

  test("native simhash60 == lambda witness on the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatches = docs.select(
        TextFunctions.simHash("text").as("native"),
        TextFunctions.simHashLambda("text").as("lambda"))
      .filter(col("native") =!= col("lambda")).count()
    assert(mismatches === 0L)
  }

  test("null-element divergence is the documented one") {
    // Unreachable via TextFunctions.simHash (split never yields null
    // elements); for a hand-built array the native expression skips null
    // tokens' bits but keeps them in the majority denominator: with tokens
    // (a, NULL, b) a bit needs >1.5 votes, i.e. both a AND b.
    val expected = {
      import org.apache.spark.unsafe.types.UTF8String
      SimHash60.hashToken(UTF8String.fromString("a")) &
        SimHash60.hashToken(UTF8String.fromString("b"))
    }
    val got = spark.sql(
        "SELECT simhash60(array('a', CAST(NULL AS STRING), 'b'))")
      .collect()(0).getLong(0)
    assert(got === expected)
  }
}
