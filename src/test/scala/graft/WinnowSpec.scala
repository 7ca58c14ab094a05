package graft

import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.Dedup

/** Equivalence of the native codegen'd [[graft.functions.Winnow60]]
  * projection and the posexplode + bounded-frame-window formulation it
  * replaced ([[Dedup.winnowFingerprintsAgg]], kept exactly as this test's
  * witness) — asserted on both the whole-stage-codegen and interpreted
  * execution paths, over hand-picked degenerate shapes plus the sf0.001
  * documents corpus. Short documents must agree on the
  * (doc_id, 0, null) contract, not just the fingerprinted rows.
  */
class WinnowSpec extends SparkSpec {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "rep rep rep rep rep rep rep rep",            // constant hashes collapse to one fp
    "a b c d e",                                  // < window + n - 1 tokens -> no fp
    "",                                           // one empty token -> no fp
    "  spaced   out   tokens   across the doc  ",
    "unicode éèê tokens 中文 mixed grams beyond window",
    "one two three four five six")                // exactly one full window

  private def check(in: DataFrame, expectShortDocs: Boolean): Unit = {
    def collect(d: DataFrame) = d.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), Option(r.getString(2))))).toMap
    val native = collect(Dedup.winnowFingerprints(in, "doc_id", "text"))
    val agg = collect(Dedup.winnowFingerprintsAgg(in, "doc_id", "text"))
    assert(native === agg)
    assert(native.values.exists(_._1 > 0))
    if (expectShortDocs) assert(native.values.exists(_._1 == 0))
  }

  private def parityOn(wholeStage: Boolean): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, wholeStage.toString)
    try {
      check(df("doc_id LONG, text STRING",
        texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }),
        expectShortDocs = true)
      check(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        expectShortDocs = false)
    } finally spark.conf.set(key, prev)
  }

  test("native winnow60 == windowed witness (whole-stage codegen)") {
    parityOn(wholeStage = true)
  }

  test("native winnow60 == windowed witness (interpreted, no codegen)") {
    parityOn(wholeStage = false)
  }

  test("randomized corpus parity: 300 seeded docs over a tiny alphabet") {
    // heavy hash repetition exercises the window-min tie and dedup paths
    val rnd = new scala.util.Random(20260813L)
    val alphabet = Vector("a", "bb", "ccc", "δ", "中", "x1", "y", "zz",
      "tok", "v2", "w", "qq")
    val docs = (0 until 300).map { i =>
      Row(i.toLong, Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" "))
    }
    check(df("doc_id LONG, text STRING", docs), expectShortDocs = true)
  }

  test("the guarantee: any shared window+n-1 token run shares a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta"   // 6 = window + n - 1
    val in = df("doc_id LONG, text STRING", Seq(
      Row(1L, s"one unique prefix here $shared"),
      Row(2L, s"$shared and a different suffix tail")))
    val fps = Dedup.winnowPairs(in, "doc_id", "text", minShared = 1)
      .collect()
    assert(fps.length === 1 && fps.head.getLong(0) === 1L && fps.head.getLong(1) === 2L)
  }
}
