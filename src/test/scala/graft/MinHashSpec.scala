package graft

import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.Dedup

/** Equivalence of the native codegen'd [[graft.functions.MinHash64]]
  * projection and the explode + hash-aggregate formulation it replaced
  * ([[Dedup.minHashSignaturesAgg]], kept exactly as this test's witness) —
  * asserted on both the whole-stage-codegen and interpreted execution
  * paths, over hand-picked degenerate shapes plus the sf0.001 documents
  * corpus. The two must agree on the DROPPED set too (no-shingle docs),
  * since downstream band explodes rely on those rows being absent.
  */
class MinHashSpec extends SparkSpec {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the the the the repeated shingle shingle",   // duplicate shingles (min unaffected)
    "a b",                                        // < 3 tokens -> no signature
    "",                                           // one empty token -> no signature
    "  spaced   out   tokens   here  ",           // whitespace normalization
    "unicode éèê tokens 中文 mixed grams",
    "exactly three tokens")                       // exactly one shingle

  private def check(in: DataFrame): Unit = {
    val native = Dedup.minHashSignatures(in, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = Dedup.minHashSignaturesAgg(in, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet === agg.keySet)
    native.keys.foreach(k => assert(native(k) === agg(k), s"doc $k diverged"))
    assert(native.values.forall(_.length === 64))
    assert(native.nonEmpty)
  }

  private def parityOn(wholeStage: Boolean): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, wholeStage.toString)
    try {
      check(df("doc_id LONG, text STRING",
        texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }))
      check(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    } finally spark.conf.set(key, prev)
  }

  test("native minhash64 == aggregate witness (whole-stage codegen)") {
    parityOn(wholeStage = true)
  }

  test("native minhash64 == aggregate witness (interpreted, no codegen)") {
    parityOn(wholeStage = false)
  }

  test("randomized corpus parity: 300 seeded docs over a tiny alphabet") {
    // a 12-token alphabet forces heavy shingle repetition (the dedup and
    // min-collision paths); lengths 0..29 cover every short-doc edge
    val rnd = new scala.util.Random(20260813L)
    val alphabet = Vector("a", "bb", "ccc", "δ", "中", "x1", "y", "zz",
      "tok", "v2", "w", "qq")
    val docs = (0 until 300).map { i =>
      Row(i.toLong, Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" "))
    }
    check(df("doc_id LONG, text STRING", docs))
  }

  test("documents shorter than the shingle width produce no signature") {
    val in = df("doc_id LONG, text STRING",
      Seq(Row(1L, "one two"), Row(2L, "one two three")))
    assert(Dedup.minHashSignatures(in, "doc_id", "text")
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("non-default shingle width and signature length flow through") {
    val in = df("doc_id LONG, text STRING", Seq(Row(1L, "a b c d e")))
    val sig = Dedup.minHashSignatures(in, "doc_id", "text", n = 2, numHashes = 16)
      .collect().head.getSeq[Long](1)
    val wit = Dedup.minHashSignaturesAgg(in, "doc_id", "text", n = 2, numHashes = 16)
      .collect().head.getSeq[Long](1)
    assert(sig === wit && sig.length === 16)
  }
}
