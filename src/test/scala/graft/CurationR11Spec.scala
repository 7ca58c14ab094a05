package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Keywords, Multimodal}

/** Golden fixtures for the round-11 curation additions: duplicated-span
  * extraction, URL canonicalization, DSIR importance weighting, and
  * video scene-cut detection. */
class CurationR11Spec extends SparkSpec {

  // ---- dupSpans -----------------------------------------------------------

  private def spans(texts: Seq[String], n: Int): Map[Long, (Int, Long, Long)] = {
    import spark.implicits._
    Dedup.dupSpans(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "doc_id", "text", n = n)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("dupSpans: a shared 4-token run in 3-gram mode merges to one span") {
    // docs 0 and 1 share "a b c d" → duplicated 3-gram positions {0,1}
    // in each → ONE span of 2+3-1 = 4 tokens; doc 2 shares nothing
    val out = spans(Seq("a b c d x", "y a b c d", "p q r s t"), n = 3)
    assert(out(0L) === ((1, 4L, 4L)))
    assert(out(1L) === ((1, 4L, 4L)))
    assert(out(2L) === ((0, 0L, 0L)))
  }

  test("dupSpans: a within-document repeat is a duplicated span") {
    // "a b c" occurs twice inside one doc → both positions duplicated;
    // positions 0 and 4 are non-adjacent → two separate 3-token spans
    val out = spans(Seq("a b c z a b c", "u v w x y z q"), n = 3)
    assert(out(0L) === ((2, 6L, 3L)))
    assert(out(1L) === ((0, 0L, 0L)))
  }

  test("dupSpans: documents shorter than n contribute and receive nothing") {
    val out = spans(Seq("a b", "a b", "a b c", "a b c"), n = 3)
    assert(out(0L) === ((0, 0L, 0L)))
    assert(out(1L) === ((0, 0L, 0L)))
    // the two 3-token docs duplicate each other exactly
    assert(out(2L) === ((1, 3L, 3L)))
    assert(out(3L) === ((1, 3L, 3L)))
  }

  test("dupSpans: two dup runs separated by a unique gram stay two spans") {
    // docs share "a b c" (pos 0) and "d e f" (pos 3) around distinct
    // middles → positions {0, 3}: two 3-token spans, 6 dup tokens
    val out = spans(Seq("a b c p d e f", "a b c q d e f"), n = 3)
    assert(out(0L) === ((2, 6L, 3L)))
    assert(out(1L) === ((2, 6L, 3L)))
  }

  // ---- exactSubstringDedup ------------------------------------------------

  private def cut(docs: Seq[(Long, String)], n: Int): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Dedup.exactSubstringDedup(docs.toDF("doc_id", "text"), "doc_id", "text", n = n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("exactSubstringDedup: a later cross-doc copy is cut, the first survives") {
    // doc 2 embeds doc 1's "a b c d": its 3-gram positions 2 ("a b c")
    // and 3 ("b c d") have earlier (doc 1) occurrences → coverage
    // {2..4} ∪ {3..5} cuts tokens a b c d, keeping "x y z"; doc 1, the
    // first occurrence, is untouched
    val out = cut(Seq(
      (1L, "a b c d e f"),
      (2L, "x y  a b c d z")), n = 3)   // doubled space normalizes away
    assert(out(1L) === ((6L, 0L, "a b c d e f")))
    assert(out(2L) === ((7L, 4L, "x y z")))
  }

  test("exactSubstringDedup: a within-doc repeat keeps its first copy") {
    // "p q r s p q r s": positions 4 ("p q r") and 5 ("q r s") repeat
    // positions 0/1 → tokens 4..7 cut, the first "p q r s" survives
    val out = cut(Seq((1L, "p q r s p q r s")), n = 3)
    assert(out(1L) === ((8L, 4L, "p q r s")))
  }

  test("exactSubstringDedup: sub-gram docs and unique docs pass through") {
    val out = cut(Seq(
      (1L, "u v"),
      (2L, "m n o p q")), n = 3)
    assert(out(1L) === ((2L, 0L, "u v")))
    assert(out(2L) === ((5L, 0L, "m n o p q")))
  }

  test("exactSubstringDedup: an entirely-duplicate doc empties") {
    val out = cut(Seq(
      (1L, "a b c d"),
      (2L, "a b c d")), n = 3)
    assert(out(1L) === ((4L, 0L, "a b c d")))
    assert(out(2L) === ((4L, 4L, "")))
  }

  test("exactSubstringDedup: null/empty-text docs keep their output row") {
    // the one-row-per-input-document contract: NULL-text docs have no
    // posexplode rows, so they only survive via the zero-fill rejoin.
    // Empty text tokenizes to one empty token (the engine-wide toksOf /
    // wCte convention shared with every token-count operator) — its row
    // comes from the normal path with n_tokens = 1
    val out = cut(Seq(
      (1L, "a b c d e"),
      (2L, null),
      (3L, "")), n = 3)
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(2L) === ((0L, 0L, "")))
    assert(out(3L) === ((1L, 0L, "")))
  }

  // ---- jaroWinkler --------------------------------------------------------

  test("jaro_winkler matches the classic convention's pinned values") {
    import spark.implicits._
    // expected values cross-checked against DuckDB's independent C++
    // implementation (jaro_winkler_similarity)
    val cases = Seq(
      ("martha", "marhta", 0.961111),   // transposition + prefix boost
      ("dixon", "dicksonx", 0.813333),  // unequal lengths
      ("jellyfish", "smellyfish", 0.896296), // no shared prefix: jaro only
      ("crate", "trace", 0.733333),     // above threshold, zero prefix
      ("abxxxxxx", "abyyyyyy", 0.5),    // below 0.7: NO prefix boost
      ("abcdefgh", "abcdefxy", 0.9),    // prefix bonus capped at 4
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("a", "", 0.0), ("", "", 0.0)     // empty inputs score zero
    )
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(round(TextFunctions.jaroWinkler(col("a"), col("b")), 6))
      .collect().map(_.getDouble(0))
    cases.map(_._3).zip(got).foreach { case (exp, g) =>
      assert(math.abs(exp - g) < 1e-6, s"expected $exp got $g")
    }
  }

  test("jaro_winkler interpreted eval equals the codegen path") {
    import graft.functions.JaroWinklerSim
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(10))(('a' + rnd.nextInt(4)).toChar).mkString
      val b = Seq.fill(rnd.nextInt(10))(('a' + rnd.nextInt(4)).toChar).mkString
      val s = JaroWinklerSim.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(s >= 0.0 && s <= 1.0, s"'$a' vs '$b' -> $s")
      // symmetry: the matching window and transposition count commute
      val s2 = JaroWinklerSim.similarity(
        UTF8String.fromString(b), UTF8String.fromString(a))
      assert(math.abs(s - s2) < 1e-12, s"asymmetric on '$a' vs '$b'")
    }
  }

  // ---- mergeUpsert --------------------------------------------------------

  test("mergeUpsert: replace, append, survive — update rows win whole") {
    import spark.implicits._
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "v", "n")
    val ups = Seq((2L, "B2", 99), (4L, "d", 40)).toDF("id", "v", "n")
    val out = Dedup.mergeUpsert(base, ups, Seq("id"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out === Map(1L -> (("a", 10)), 2L -> (("B2", 99)),
      3L -> (("c", 30)), 4L -> (("d", 40))))
  }

  test("mergeUpsert: composite keys and schema mismatch rejection") {
    import spark.implicits._
    val base = Seq((1L, "x", 1), (1L, "y", 2)).toDF("id", "k2", "n")
    val ups = Seq((1L, "y", 9)).toDF("id", "k2", "n")
    val out = Dedup.mergeUpsert(base, ups, Seq("id", "k2"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(out === Map((1L, "x") -> 1, (1L, "y") -> 9))
    intercept[IllegalArgumentException] {
      Dedup.mergeUpsert(base, ups.drop("n"), Seq("id"))
    }
  }

  // ---- jaccardPairsPrefix -------------------------------------------------

  test("prefix-filtered jaccard equals the plain co-occurrence join (corpus)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plain = rowSet(Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 3, minJaccard = 0.8))
    val pref = rowSet(Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
      n = 3, minJaccard = 0.8))
    assert(pref === plain)
    assert(plain.nonEmpty) // the corpus fixture has real near-dup pairs
  }

  test("prefix-filtered jaccard equals plain at a low threshold too") {
    // t = 0.5 doubles the prefix length — exercises the ceil arithmetic
    // away from the battery's 0.8 point
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
    val plain = rowSet(Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 3, minJaccard = 0.5))
    val pref = rowSet(Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
      n = 3, minJaccard = 0.5))
    assert(pref === plain)
  }

  test("boilerplate shared by every doc generates no prefix candidates") {
    import spark.implicits._
    // every doc ends with the same boilerplate sentence; contents differ
    // entirely. Plain join pairs every doc through the boilerplate
    // shingles and discards them at the threshold; the prefix join must
    // reach the same (empty) answer — boilerplate sorts LAST by df
    val boiler = "all rights reserved contact us today"
    val docs = (0L until 30L)
      .map(i => (i, s"unique$i body$i text$i payload$i row$i $boiler"))
      .toDF("doc_id", "text")
    assert(Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
      n = 3, minJaccard = 0.8).count() === 0L)
  }

  // ---- fuzzyMatchPairs ----------------------------------------------------

  test("fuzzyMatchPairs: in-block typos pair, cross-block and far names don't") {
    import spark.implicits._
    val recs = Seq(
      (1L, "Acme Corp"),     // "acme corp": dist 1 to both variants below
      (2L, "Acme Corp."),
      (3L, "ACME  CORPS"),   // whitespace collapses, case lowers
      (4L, "Acme Incorporated"), // same prefix, different length band
      (5L, "Zen Corp")       // different block prefix
    ).toDF("id", "name")
    val out = Dedup.fuzzyMatchPairs(recs, "id", "name", maxEdit = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(4)).toMap
    assert(out === Map((1L, 2L) -> 1, (1L, 3L) -> 1, (2L, 3L) -> 1))
  }

  test("fuzzyMatchPairs: maxEdit gates the pair set") {
    import spark.implicits._
    val recs = Seq((1L, "abcdef"), (2L, "abcxxx")).toDF("id", "name")
    assert(Dedup.fuzzyMatchPairs(recs, "id", "name", maxEdit = 2).count() === 0L)
    assert(Dedup.fuzzyMatchPairs(recs, "id", "name", maxEdit = 3).count() === 1L)
  }

  // the hot-block guard, pinned directly with maxBlockSize lowered to 4:
  // sub-splits on extended prefixes, the round-2 re-split, the stop-block
  // drop (with the audit view), and inertness on under-cap corpora

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("fuzzyMatchPairs: over-full blocks sub-split on extended prefixes") {
    import spark.implicits._
    // six records share block ("aaa", len band 2) — over a cap of 4 —
    // but differ at name chars 4-5, so ONE splitStep=2 extension lands
    // them in three under-cap sub-blocks of two
    val recs = Seq(
      (1L, "aaabb0001"), (2L, "aaabb0002"),
      (3L, "aaacc0001"), (4L, "aaacc0002"),
      (5L, "aaadd0001"), (6L, "aaadd0002")).toDF("id", "name")
    val capped = Dedup.fuzzyMatchPairs(recs, "id", "name", maxBlockSize = 4)
    // within-sub-block dist-1 pairs survive; the six cross-sub-block
    // dist-2 pairs are the documented prefix-blocking recall loss
    assert(pairSet(capped) === Set((1L, 2L), (3L, 4L), (5L, 6L)))
    val uncapped = Dedup.fuzzyMatchPairs(recs, "id", "name",
      maxBlockSize = 1000000)
    assert(pairSet(uncapped) === Set((1L, 2L), (3L, 4L), (5L, 6L),
      (1L, 3L), (2L, 4L), (1L, 5L), (2L, 6L), (3L, 5L), (4L, 6L)))
    // nothing was stop-block dropped — the split alone resolved the block
    assert(Dedup.fuzzyMatchDropped(recs, "id", "name",
      maxBlockSize = 4).count() === 0L)
  }

  test("fuzzyMatchPairs: a still-over-full block re-splits in round two") {
    import spark.implicits._
    // all six share name chars 1-5, so the round-1 extension to prefix 5
    // leaves ONE over-full block; round 2 (prefix 7) resolves it. The
    // three dist-1 pairs appearing proves round 2 blocks PAIR, not drop
    val recs = Seq(
      (1L, "aaabbcc0001"), (2L, "aaabbcc0002"),
      (3L, "aaabbdd0001"), (4L, "aaabbdd0002"),
      (5L, "aaabbee0001"), (6L, "aaabbee0002")).toDF("id", "name")
    val out = Dedup.fuzzyMatchPairs(recs, "id", "name", maxBlockSize = 4)
    assert(pairSet(out) === Set((1L, 2L), (3L, 4L), (5L, 6L)))
    assert(Dedup.fuzzyMatchDropped(recs, "id", "name",
      maxBlockSize = 4).count() === 0L)
  }

  test("fuzzyMatchPairs: unsplittable over-full blocks drop, audited, others unaffected") {
    import spark.implicits._
    // "xyz" is exactly blockPrefix long — no chars to extend on — so its
    // six-record block survives every split round over-full and the
    // stop-block rule drops all six. The under-cap "aaabb000x" block in
    // the same corpus must keep its pair
    val recs = Seq(
      (1L, "xyz"), (2L, "xyz"), (3L, "xyz"),
      (4L, "xyz"), (5L, "xyz"), (6L, "xyz"),
      (7L, "aaabb0001"), (8L, "aaabb0002")).toDF("id", "name")
    val pairs = Dedup.fuzzyMatchPairs(recs, "id", "name", maxBlockSize = 4)
    assert(pairSet(pairs) === Set((7L, 8L)))
    val dropped = Dedup.fuzzyMatchDropped(recs, "id", "name", maxBlockSize = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(dropped.toSet === (1L to 6L).map(i => (i, "xyz", 6L)).toSet)
  }

  test("fuzzyMatchPairs: the cap is inert on an under-cap corpus") {
    import spark.implicits._
    // every block holds at most 4 records, so split rounds are no-ops
    // and the guarded result is identical to the effectively-uncapped one
    val recs = Seq(
      (1L, "aaabb0001"), (2L, "aaabb0002"), (3L, "aaabb0003"),
      (4L, "aaacc0001"), (5L, "zzz tail"), (6L, "zzz tail.")
    ).toDF("id", "name")
    def rows(cap: Int) =
      Dedup.fuzzyMatchPairs(recs, "id", "name", maxBlockSize = cap)
        .collect().map(_.toSeq).toSet
    assert(rows(4) === rows(1000000))
    assert(rows(4).nonEmpty)
  }

  // ---- canonicalUrl -------------------------------------------------------

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u")
      .select(TextFunctions.canonicalUrl(col("u")).as("c"))
      .collect().head.getString(0)
  }

  test("canonicalUrl: case, default port, fragment, tracking params, sort") {
    assert(canon("HTTP://WWW.Example.COM:80/a/b?utm_source=x&b=2&a=1#frag")
      === "http://www.example.com/a/b?a=1&b=2")
    assert(canon("https://Host.io:443/p?fbclid=Z&z=9&gclid=Q")
      === "https://host.io/p?z=9")
  }

  test("canonicalUrl: non-default port and empty path survive normalized") {
    assert(canon("https://h.co:8080") === "https://h.co:8080/")
    assert(canon("http://h.co?b=2&a=1") === "http://h.co/?a=1&b=2")
  }

  test("canonicalUrl: trailing host dot strips; ref param is tracking") {
    assert(canon("http://example.org./x?ref=hp&id=3")
      === "http://example.org/x?id=3")
  }

  test("canonicalUrl: all params tracking leaves no query") {
    assert(canon("http://a.b/c?utm_a=1&utm_b=2&ref=x") === "http://a.b/c")
  }

  test("canonicalUrl: IPv6 literals keep their brackets and real ports only") {
    // the host's own trailing ':1' must NOT read as a port
    assert(canon("http://[::1]/x") === "http://[::1]/x")
    assert(canon("HTTP://[2001:DB8::1]:80/x") === "http://[2001:db8::1]/x")
    assert(canon("http://[::1]:8080/x") === "http://[::1]:8080/x")
  }

  // ---- dsirWeights --------------------------------------------------------

  test("dsirWeights: target-like documents outrank off-target ones") {
    import spark.implicits._
    val docs = Seq(
      (0L, "ml models train fast", "tgt"),
      (1L, "ml models train fast", "tgt"),
      (2L, "ml models train well", "raw"),
      (3L, "cats sleep all day", "raw"),
      (4L, "dogs bark all night", "raw")
    ).toDF("doc_id", "text", "kind")
    val out = Keywords.dsirWeights(docs, "doc_id", "text",
        docs.filter(col("kind") === "tgt"), topK = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.size === 5)
    // the target-verbatim docs score highest and fill the top-2
    assert(out(0L)._3 && out(1L)._3)
    assert(!out(2L)._3 && !out(3L)._3 && !out(4L)._3)
    // near-target beats off-target
    assert(out(2L)._2 > out(3L)._2)
    assert(out(0L)._1 === 4L) // n_tokens
  }

  test("dsirWeights: identical target and raw corpora give zero weights") {
    import spark.implicits._
    val docs = Seq((0L, "x y z"), (1L, "x y q")).toDF("doc_id", "text")
    val out = Keywords.dsirWeights(docs, "doc_id", "text", docs, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.values.forall(_ === 0L))
  }

  // ---- videoCutDetect -----------------------------------------------------

  test("videoCutDetect: one color switch is one cut at the right frame") {
    import spark.implicits._
    System.setProperty("java.awt.headless", "true")
    val a = Multimodal.encodePng(8, 8, (_, _) => 0x101010)
    val b = Multimodal.encodePng(8, 8, (_, _) => 0xF0F0F0)
    val avi = Multimodal.syntheticAviPng(Seq(a, a, a, b, b))
    val out = Multimodal.videoCutDetect(
        Seq((7L, avi)).toDF("doc_id", "payload"), "doc_id", threshold = 48.0)
      .collect().head
    assert(out.getLong(1) === 5L)  // n_frames
    assert(out.getLong(2) === 4L)  // n_compared
    assert(out.getLong(3) === 1L)  // n_cuts
    assert(out.getLong(4) === 4L)  // first_cut: frame 4 (1-based) opens shot B
  }

  test("videoCutDetect: constant clip has zero cuts; non-AVI gives NULLs") {
    import spark.implicits._
    System.setProperty("java.awt.headless", "true")
    val a = Multimodal.encodePng(4, 4, (_, _) => 0x808080)
    val avi = Multimodal.syntheticAviPng(Seq(a, a, a))
    val rows = Multimodal.videoCutDetect(
        Seq((1L, avi), (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload"),
        "doc_id", threshold = 48.0)
      .orderBy("id").collect()
    assert(rows(0).getLong(3) === 0L && rows(0).getLong(4) === -1L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(3))
  }

  test("videoCutDetect: dimension changes are skipped, not compared") {
    import spark.implicits._
    System.setProperty("java.awt.headless", "true")
    val small = Multimodal.encodePng(4, 4, (_, _) => 0x000000)
    val big = Multimodal.encodePng(8, 8, (_, _) => 0xFFFFFF)
    val avi = Multimodal.syntheticAviPng(Seq(small, big, big))
    val out = Multimodal.videoCutDetect(
        Seq((1L, avi)).toDF("doc_id", "payload"), "doc_id", threshold = 48.0)
      .collect().head
    assert(out.getLong(2) === 1L) // only big↔big compared
    assert(out.getLong(3) === 0L)
  }

  test("video walks: repeated frames + an undecodable frame between repeats " +
      "keep exact counts (the decode-memo invariance pin)") {
    // [A, A, garbage, A, B, B]: the counters must read as if every frame
    // were decoded independently — a one-entry decode memo (r20) may only
    // short-circuit byte-identical repeats, and a failed decode sitting
    // between two identical frames must not poison the comparison chain
    import spark.implicits._
    System.setProperty("java.awt.headless", "true")
    val a = Multimodal.encodePng(4, 4, (_, _) => 0x101010)
    val b = Multimodal.encodePng(4, 4, (_, _) => 0xF0F0F0)
    val garbage = Array[Byte](9, 9, 9, 9)
    val avi = Multimodal.syntheticAviPng(Seq(a, a, garbage, a, b, b))
    val cut = Multimodal.videoCutDetect(
        Seq((1L, avi)).toDF("doc_id", "payload"), "doc_id", threshold = 48.0)
      .collect().head
    assert(cut.getLong(1) === 6L) // n_frames
    assert(cut.getLong(2) === 4L) // A-A, A-A (across the garbage), A-B, B-B
    assert(cut.getLong(3) === 1L) // the A->B switch
    assert(cut.getLong(4) === 5L) // frame 5 (1-based) opens shot B
    val samp = Multimodal.sampleVideoFrames(
        Seq((1L, avi)).toDF("doc_id", "payload"), "doc_id", step = 1)
      .collect().head
    assert(samp.getLong(1) === 6L) // n_frames
    assert(samp.getLong(2) === 5L) // garbage frame skipped from the sums
    assert(samp.getLong(3) === 3L * 16 * 0x10 + 2L * 16 * 0xF0) // r_sum: 3 A + 2 B rasters
  }
}
