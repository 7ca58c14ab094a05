package graft

import graft.operators.Bpe

/** Hand-computed BPE induction on the classic banana corpus: pair
  * statistics, lexicographic tie-breaks, greedy-left merge application,
  * and the apply path. */
class BpeSpec extends SparkSpec {

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("three merge rounds match hand-computed pair counts and ties") {
    // words: banana ×2, bandana ×1
    val docs = corpus("banana bandana", "banana")
    val m = Bpe.learnMerges(docs, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // r1: (a,n) 6 beats (n,a) 5
    assert(m(0) === ((1, "a", "n", 6L)))
    // r2: (an,a) and (b,an) tie at 3; 'an' < 'b' lexicographically
    assert(m(1) === ((2, "an", "a", 3L)))
    // r3: (b,an) 3 over (an,ana) 2
    assert(m(2) === ((3, "b", "an", 3L)))
  }

  test("applyMerges tokenizes with greedy-left application in merge order") {
    val docs = corpus("banana bandana")
    val out = Bpe.applyMerges(docs, "text",
        Seq(("a", "n"), ("an", "a"), ("b", "an")))
      .select("bpe_tokens").collect()(0).getSeq[String](0)
    assert(out === Seq("ban", "ana", "ban", "d", "ana"))
  }

  test("single-character words survive with no pairs") {
    val docs = corpus("a b a x")
    val m = Bpe.learnMerges(docs, "text", rounds = 2).collect()
    assert(m.isEmpty) // no adjacent pairs anywhere -> no merges learnable
    val applied = Bpe.applyMerges(docs, "text", Seq(("a", "n")))
      .select("bpe_tokens").collect()(0).getSeq[String](0)
    assert(applied === Seq("a", "b", "a", "x"))
  }

  test("incremental learnMerges equals the full recompute witness") {
    // 8 rounds over a mixed corpus with repeated structure — enough rounds
    // that composite symbols (ab+neighbor) feed later merges, so any
    // incremental-delta error (missed affected word, uncancelled pair)
    // diverges from the per-round full recompute
    val docs = corpus(
      "banana bandana cabana", "the theatre heathen then",
      "mississippi missive permission", "banana banana the the",
      "ababab abba bab")
    val inc = Bpe.learnMerges(docs, "text", rounds = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val full = Bpe.learnMergesRecompute(docs, "text", rounds = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(inc === full)
    assert(inc.length === 8)
  }

  test("incremental learning runs past the point where pairs exhaust") {
    // tiny corpus exhausts its pairs before the requested rounds; the
    // incremental loop must stop cleanly, not emit ghost merges
    val docs = corpus("ab ab")
    val m = Bpe.learnMerges(docs, "text", rounds = 10).collect()
    assert(m.length === 1)
    assert((m(0).getString(1), m(0).getString(2)) === (("a", "b")))
  }

  test("back-to-back pair occurrences all merge in one round's rewrite") {
    // 'aaaa': r1 learns (a,a) count 3 (positional/overlapping statistic);
    // greedy-left application yields aa aa
    val docs = corpus("aaaa")
    val m = Bpe.learnMerges(docs, "text", rounds = 1).collect()
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(3)) === (("a", "a", 3L)))
    val applied = Bpe.applyMerges(docs, "text", Seq(("a", "a")))
      .select("bpe_tokens").collect()(0).getSeq[String](0)
    assert(applied === Seq("aa", "aa"))
  }
}
