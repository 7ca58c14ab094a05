package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, Retention}

/** Randomized cross-checks of the round-11 operators against brute-force
  * Scala reference implementations — seeded, so failures reproduce. The
  * oracle battery proves Spark == DuckDB on one corpus; these prove the
  * operator == the definition on many. */
class PropertyR11Spec extends SparkSpec {

  private val rnd = new scala.util.Random(20260814L)

  // ---- triangleCounts vs triple enumeration -------------------------------

  test("triangleCounts matches triple enumeration on random graphs") {
    import spark.implicits._
    for (trial <- 1 to 4) {
      val n = 8 + trial * 3
      val p = 0.15 + 0.15 * trial
      val edges = (for {
        a <- 0L until n; b <- 0L until n
        if a != b && rnd.nextDouble() < p
      } yield (a, b)).toSeq
      val und = edges.map { case (a, b) => (a min b, a max b) }.toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val expect = nodes.map { v =>
        v -> nodes.combinations(2).count { case Seq(x, y) =>
          v != x && v != y &&
            und(((v min x), (v max x))) && und(((v min y), (v max y))) &&
            und(((x min y), (x max y)))
        }.toLong
      }.toMap
      val got = Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"trial $trial (n=$n, p=$p)")
    }
  }

  // ---- dupSpans vs positional brute force ---------------------------------

  private def bruteSpans(texts: Seq[String], n: Int): Map[Long, (Int, Long, Long)] = {
    val toks = texts.map(_.trim.replaceAll("\\s+", " ").split(" ").toSeq)
    val grams = toks.zipWithIndex.flatMap { case (ts, d) =>
      if (ts.length < n) Seq.empty
      else ts.sliding(n).zipWithIndex.map { case (g, p) => (d.toLong, p, g.mkString(" ")) }.toSeq
    }
    val freq = grams.groupBy(_._3).map { case (g, v) => g -> v.size }
    texts.indices.map { d =>
      val dup = grams.filter(x => x._1 == d && freq(x._3) >= 2).map(_._2).sorted
      // merge consecutive positions into islands
      val runs = dup.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
      val lens = runs.map { case (s, e) => (e - s + 1 + n - 1).toLong }
      d.toLong -> ((runs.size, lens.sum, if (lens.isEmpty) 0L else lens.max))
    }.toMap
  }

  test("dupSpans matches the positional brute force on random corpora") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 4) {
      val texts = Seq.fill(8)(
        Seq.fill(4 + rnd.nextInt(18))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val got = Dedup.dupSpans(
          texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
          "doc_id", "text", n = 3)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got === bruteSpans(texts, 3), s"trial $trial: $texts")
    }
  }

  // ---- degreeProfile vs direct counting -----------------------------------

  test("degreeProfile matches direct counting on random digraphs") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val n = 10L
      val edges = (for {
        a <- 0L until n; b <- 0L until n
        if a != b && rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      val es = edges.toSet
      val nodes = es.flatMap(e => Seq(e._1, e._2))
      val expect = nodes.map { v =>
        val out = es.count(_._1 == v).toLong
        val in = es.count(_._2 == v).toLong
        val rec = es.count(e => e._1 == v && es((e._2, e._1))).toLong
        v -> ((out, in, rec, in == 0, out == 0))
      }.toMap
      val got = Graph.degreeProfile(edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
        .toMap
      assert(got === expect, s"trial $trial")
    }
  }

  // ---- cohortRetention vs direct counting ---------------------------------

  test("cohortRetention matches direct counting on random activity") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val ev = Seq.fill(60)((rnd.nextInt(8).toLong, rnd.nextInt(100).toLong))
      val act = ev.map { case (u, t) => (u, t / 10) }.distinct
      val cohort = act.groupBy(_._1).map { case (u, v) => u -> v.map(_._2).min }
      val expect = act.groupBy { case (u, p) => (cohort(u), p - cohort(u)) }
        .map { case (k, v) => k -> v.size.toLong }
      val got = Retention.cohortRetention(ev.toDF("user_id", "ts_ms"),
          "user_id", col("ts_ms"), periodMs = 10L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expect, s"trial $trial")
    }
  }
}
