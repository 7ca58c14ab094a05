package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Keywords, Packing, Sampling}

/** Semantics of the training-data curation operators: as-of joins,
  * deterministic stratified sampling, exact quantiles, sequence packing. */
class CurationOpsSpec extends SparkSpec {

  test("as-of join picks the latest right row at or before each left ts") {
    val left = df("id LONG, k STRING, ts LONG", Seq(
      Row(1L, "u1", 10L),   // before any right row -> null
      Row(2L, "u1", 20L),   // exactly at right ts 20 -> <= matches it
      Row(3L, "u1", 35L),   // between 30 and 40 -> 30
      Row(4L, "u1", 99L),   // after everything -> 40
      Row(5L, "u2", 50L),   // other key: only u2 rows visible -> 45
      Row(6L, "u3", 50L)))  // key with no right rows at all -> null
    val right = df("k STRING, ts LONG, price DOUBLE", Seq(
      Row("u1", 20L, 2.0), Row("u1", 30L, 3.0), Row("u1", 40L, 4.0),
      Row("u2", 45L, 45.0)))
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", Seq("price"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(3.0), 4L -> Some(4.0),
      5L -> Some(45.0), 6L -> None))
  }

  test("as-of forward and nearest directions") {
    val left = df("id LONG, k STRING, ts LONG", Seq(
      Row(1L, "u1", 10L),   // fwd -> 20; bwd none -> nearest 20
      Row(2L, "u1", 20L),   // exactly at 20: fwd AND nearest match it
      Row(3L, "u1", 34L),   // nearest: 30 (dist 4) vs 40 (dist 6) -> 30
      Row(4L, "u1", 35L),   // equidistant 30/40 -> tie goes BACKWARD -> 30
      Row(5L, "u1", 36L),   // nearest: 40 (dist 4) beats 30 (dist 6)
      Row(6L, "u1", 99L)))  // fwd -> null; nearest falls back to bwd 40
    val right = df("k STRING, ts LONG, price DOUBLE", Seq(
      Row("u1", 20L, 2.0), Row("u1", 30L, 3.0), Row("u1", 40L, 4.0)))
    def run(dir: String) = AsOf.joinAsOf(left, right, Seq("k"), "ts",
        Seq("price"), direction = dir)
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(run("forward") === Map(
      1L -> Some(2.0), 2L -> Some(2.0), 3L -> Some(4.0), 4L -> Some(4.0),
      5L -> Some(4.0), 6L -> None))
    assert(run("nearest") === Map(
      1L -> Some(2.0), 2L -> Some(2.0), 3L -> Some(3.0), 4L -> Some(3.0),
      5L -> Some(4.0), 6L -> Some(4.0)))
  }

  test("as-of join ignores right rows with a null timestamp") {
    // ascending sort puts nulls first: an unfiltered null-ts right row
    // would become the match for left rows preceding every real right row
    val left = df("id LONG, k STRING, ts LONG", Seq(Row(1L, "u1", 10L)))
    val right = df("k STRING, ts LONG, price DOUBLE", Seq(
      Row("u1", null, 99.0),   // dirty row: r.ts <= l.ts is never true
      Row("u1", 20L, 2.0)))
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", Seq("price")).collect().head
    assert(out.isNullAt(3))
  }

  test("as-of tolerance works on timestamp-typed ordering columns") {
    // ts - _rts on TimestampType yields an INTERVAL, which can't compare
    // to the bigint tolerance — the operator normalizes to unix_micros
    // (tolerance unit = microseconds for timestamp columns)
    val left = df("id LONG, k STRING, ts TIMESTAMP", Seq(
      Row(1L, "u1", java.sql.Timestamp.valueOf("2024-01-01 00:00:05")),
      Row(2L, "u1", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"))))
    val right = df("k STRING, ts TIMESTAMP, price DOUBLE", Seq(
      Row("u1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0)))
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", Seq("price"),
        tolerance = Some(10L * 1000000))  // 10 s in micros
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(1L -> Some(1.0), 2L -> None))
  }

  test("as-of join payload overload carries all non-key right columns") {
    val left = df("id LONG, k STRING, ts LONG", Seq(Row(1L, "a", 5L)))
    val right = df("k STRING, ts LONG, x DOUBLE, y STRING", Seq(Row("a", 3L, 1.5, "v")))
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts").collect().head
    assert(out.getDouble(3) === 1.5)
    assert(out.getString(4) === "v")
  }

  test("sequence packing is first-fit in id order with per-group reset") {
    val in = df("lang STRING, doc_id LONG, n INT", Seq(
      Row("en", 1L, 60), Row("en", 2L, 30), Row("en", 3L, 20),  // 60+30 fit, 20 overflows
      Row("en", 4L, 150),                                       // oversized -> own pack
      Row("en", 5L, 10),
      Row("de", 1L, 70), Row("de", 2L, 20)))                    // fresh group restarts at pack 0
    val out = Packing.packSequences(in, "lang", "doc_id", "n", capacity = 100)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getInt(4))).toMap
    assert(out(("en", 1L)) === ((0L, 0)))
    assert(out(("en", 2L)) === ((0L, 60)))
    assert(out(("en", 3L)) === ((1L, 0)))    // 90 + 20 > 100 -> next pack
    assert(out(("en", 4L)) === ((2L, 0)))    // 150 > capacity -> its own pack
    assert(out(("en", 5L)) === ((3L, 0)))    // oversized pack is full -> next
    assert(out(("de", 1L)) === ((0L, 0)))
    assert(out(("de", 2L)) === ((0L, 70)))
  }

  test("packing never splits a pack across groups and respects capacity") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n"))
    val packed = Packing.packSequences(docs, "lang", "doc_id", "n", capacity = 256)
    val perPack = packed.groupBy("lang", "pack_id")
      .agg(sum("n").as("tot"), max("n").as("mx")).collect()
    perPack.foreach { r =>
      assert(r.getLong(2) <= 256 || r.getLong(3) > 256,
        s"pack over capacity without an oversized doc: $r")
    }
    assert(packed.count() === docs.count())
  }

  test("stratified sample is deterministic and tracks the requested rates") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rates = Map("en" -> 0.5, "zh" -> 0.9)
    def ids() = Sampling.stratifiedSample(docs, "lang", "doc_id", rates, defaultRate = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = ids()
    assert(s1 === ids(), "same inputs must sample the same rows")
    // repartitioning must not change the sample (partition independence)
    val s2 = Sampling.stratifiedSample(docs.repartition(13), "lang", "doc_id",
        rates, defaultRate = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
    // rate sanity on the biggest stratum (en, n=22 at sf0.001 is small; use
    // loose bounds): sampled fraction within [0.2, 0.8] for rate 0.5
    val en = docs.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val enSampled = s1.intersect(en).size.toDouble / en.size
    assert(enSampled > 0.2 && enSampled < 0.8, s"en sampled fraction $enSampled")
  }

  test("temperature mix applies the tempered per-stratum rates exactly") {
    // strata: en n=4, zh n=1; T=2 -> w = sqrt(n) = (2, 1); N=5, W=3
    //   rate_en = 0.5*5*2/(3*4) = 0.41666..., rate_zh = 0.5*5*1/(3*1) = 0.8333...
    // (rates round to 6 decimals before the threshold compare)
    val in = df("doc_id LONG, lang STRING", Seq(
      Row(1L, "en"), Row(2L, "en"), Row(3L, "en"), Row(4L, "en"), Row(5L, "zh")))
    val out = Sampling.temperatureMix(in, "lang", "doc_id",
      temperature = 2.0, targetFraction = 0.5)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rateEn = r6(0.5 * 5.0 * 2.0 / (3.0 * 4.0))
    val rateZh = r6(0.5 * 5.0 * 1.0 / (3.0 * 1.0))
    val expected = in.filter(Sampling.hashUnit(col("doc_id"), "graft-mix") <
      when(col("lang") === "en", rateEn).otherwise(rateZh))
    assert(rowSet(out) === rowSet(expected))
    assert(out.columns.toSeq === in.columns.toSeq, "original columns only")
  }

  test("temperature mix treats a NULL stratum as a stratum, not a drop") {
    // failed language ID must neither vanish nor deflate everyone's rate:
    // 4 null-lang docs + 4 en docs, T=2, target 1.0 -> both rates
    // = 1.0*8*2/(4*4) = 1.0 -> EVERY row survives. An equi-join
    // implementation would silently drop all 4 null rows.
    val in = df("doc_id LONG, lang STRING",
      (1L to 8L).map(i => Row(i, if (i <= 4) null else "en")))
    val out = Sampling.temperatureMix(in, "lang", "doc_id",
      temperature = 2.0, targetFraction = 1.0)
    assert(out.count() === 8)
  }

  test("temperature mix lifts rare strata and lands near the target total") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val n = docs.count().toDouble
    val sampled = Sampling.temperatureMix(docs, "lang", "doc_id",
      temperature = 2.0, targetFraction = 0.3)
    val frac = sampled.count() / n
    assert(frac > 0.2 && frac < 0.4, s"sampled fraction $frac vs target 0.3")
    // tempering must keep a LARGER fraction of the rarest language than of
    // the most common one (that is the whole point of T > 1)
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptByLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rarest = byLang.minBy(_._2)._1
    val biggest = byLang.maxBy(_._2)._1
    val rarestFrac = keptByLang.getOrElse(rarest, 0L).toDouble / byLang(rarest)
    val biggestFrac = keptByLang.getOrElse(biggest, 0L).toDouble / byLang(biggest)
    assert(rarestFrac > biggestFrac,
      s"rarest '$rarest' kept $rarestFrac <= biggest '$biggest' kept $biggestFrac")
  }

  test("helper columns are collision-proof: caller frames may own 'rate'/'_rn0'") {
    // a caller frame already carrying the operators' old working-column
    // names must neither hit an ambiguous-reference AnalysisException nor
    // have its own column silently replaced/filtered on
    val in = df("doc_id LONG, lang STRING, rate DOUBLE, _stratum STRING, _rn0 LONG", Seq(
      Row(1L, "en", 9.9, "x", 7L), Row(2L, "en", 9.9, "x", 7L),
      Row(3L, "zh", 9.9, "x", 7L), Row(4L, "zh", 9.9, "x", 7L)))
    val mixed = Sampling.temperatureMix(in, "lang", "doc_id",
      temperature = 2.0, targetFraction = 1.0)
    assert(mixed.count() === 4)
    assert(mixed.columns.toSeq === in.columns.toSeq)
    assert(mixed.select("rate").collect().forall(_.getDouble(0) === 9.9),
      "caller's own 'rate' column must survive untouched")
    val taken = Sampling.takePerStratum(in, "lang", "doc_id", n = 1)
    assert(taken.count() === 2)
    assert(taken.columns.toSeq === in.columns.toSeq)
    assert(taken.select("_rn0").collect().forall(_.getLong(0) === 7L),
      "caller's own '_rn0' column must survive untouched")
  }

  test("clusterBalancedSample takes exact per-cluster quotas, deterministically") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sample = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
      nPerCluster = 3, nClusters = 8, kmeansIters = 2)
    val perCluster = sample.groupBy("cluster").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perCluster.values.forall(_ <= 3))
    assert(sample.count() === perCluster.values.sum)
    assert(perCluster.values.sum >= 3 * 4, "most of the 8 clusters populated")
    // content-addressed: a second run reproduces the sample bit-for-bit
    val again = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
      nPerCluster = 3, nClusters = 8, kmeansIters = 2)
    assert(rowSet(sample) === rowSet(again))
  }

  test("takePerStratum is count-exact, repartition-invariant and growth-stable") {
    val base = df("doc_id LONG, lang STRING",
      (1L to 9L).map(i => Row(i, if (i <= 6) "en" else "zh")))
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.takePerStratum(d, "lang", "doc_id", n = 2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = ids(base)
    // count-exact: min(n, stratum size) per stratum — 2 en + 2 zh
    assert(s1.size === 4)
    assert(ids(base.repartition(7)) === s1, "partitioning must not matter")
    // a one-doc stratum yields that one doc
    val tiny = base.union(df("doc_id LONG, lang STRING", Seq(Row(100L, "fr"))))
    assert(ids(tiny).contains(100L))
    // growth stability: adding docs never ADMITS a previously-rejected doc
    // (a chosen doc can only be displaced by a new doc hashing below it)
    val grown = base.union(df("doc_id LONG, lang STRING",
      (10L to 15L).map(i => Row(i, if (i % 2 == 0) "en" else "zh"))))
    val s2 = ids(grown)
    assert(s2.filter(_ <= 9L).subsetOf(s1),
      s"grown sample re-admitted a rejected doc: $s1 -> $s2")
  }

  test("bm25 matches hand arithmetic and saturates vs raw tf-idf") {
    val in = df("doc_id LONG, text STRING", Seq(
      Row(1L, "apple banana apple"),
      Row(2L, "banana cherry")))
    // N=2, avgdl=2.5; apple: tf=2 df=1 dl=3
    val out = Keywords.bm25TopTerms(in, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(2)) -> r.getDouble(4)).toMap
    def sc(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log((2.0 - df + 0.5) / (df + 0.5) + 1.0)
      val raw = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.5))
      math.rint(raw * 10000) / 10000 // close enough for these fixtures
    }
    assert(math.abs(out((1L, "apple")) - sc(2, 1, 3)) < 1e-9)
    assert(math.abs(out((1L, "banana")) - sc(1, 2, 3)) < 1e-9)
    assert(math.abs(out((2L, "cherry")) - sc(1, 1, 2)) < 1e-9)
    // the distinctive term outranks the corpus-wide one in both docs
    assert(out((1L, "apple")) > out((1L, "banana")))
    assert(out((2L, "cherry")) > out((2L, "banana")))
  }

  test("sessionization splits on gap > timeout and resets per key") {
    import graft.operators.Sessionize
    val ev = df("id LONG, k STRING, ts LONG", Seq(
      Row(1L, "u1", 0L), Row(2L, "u1", 50L), Row(3L, "u1", 90L),  // one session
      Row(4L, "u1", 300L),                                        // gap 210 > 100 -> new
      Row(5L, "u1", 350L),
      Row(6L, "u2", 0L)))                                         // other key restarts at 1
    val out = Sessionize.sessionStats(ev, Seq("k"), "ts", gapMs = 100L, tieCols = Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(("u1", 1L)) === ((3L, 0L, 90L, 90L)))
    assert(out(("u1", 2L)) === ((2L, 300L, 350L, 50L)))
    assert(out(("u2", 1L)) === ((1L, 0L, 0L, 0L)))
    assert(out.size === 3)
  }

  test("exact quantiles match a hand-computed interpolation") {
    val in = df("g STRING, v DOUBLE", Seq(
      Row("a", 1.0), Row("a", 2.0), Row("a", 3.0), Row("a", 4.0),
      Row("b", 10.0)))
    val out = Sampling.exactQuantiles(in, Seq("g"), "v",
        Seq(0.5, 0.25), Seq("med", "q1"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a") === ((2.5, 1.75)))  // linear interpolation between ranks
    assert(out("b") === ((10.0, 10.0)))
  }

  test("selectByBudget fills greedily by score and stops at the budget") {
    val in = df("id LONG, score DOUBLE, cost LONG", Seq(
      Row(1L, 0.9, 40L),   // rank 1: cum 40
      Row(2L, 0.9, 30L),   // rank 2 (tie -> id): cum 70
      Row(3L, 0.5, 50L),   // rank 4: cum 140 > 120 -> excluded
      Row(4L, 0.7, 20L),   // rank 3: cum 90
      Row(5L, 0.1, 10L)))  // rank 5: excluded (selection is prefix-only)
    val out = Sampling.selectByBudget(in, "id", "score", "cost", budget = 120L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === Map(1L -> 40L, 2L -> 70L, 4L -> 90L))
  }

  test("selectByBudget is partitioning-invariant and handles edge budgets") {
    val rows = (1 to 200).map(i => Row(i.toLong, (i % 17).toDouble, (i % 7 + 1).toLong))
    val in = df("id LONG, score DOUBLE, cost LONG", rows)
    def ids(parts: Int, budget: Long) =
      Sampling.selectByBudget(in.repartition(parts), "id", "score", "cost",
        budget, numPartitions = parts).collect().map(_.getLong(0)).toSet
    val base = ids(2, 300L)
    assert(ids(7, 300L) === base)
    assert(ids(32, 300L) === base)
    assert(ids(4, 0L) === Set.empty)
    val total = rows.map(_.getLong(2)).sum
    assert(ids(4, total) === (1 to 200).map(_.toLong).toSet)
  }

  test("approx quantiles return genuine data points within the rank bound") {
    // 1..1000 per group: at accuracy 10000 the rank error is <= n/accuracy
    // = 0.1 ranks, i.e. the sketch must land on a value within one rank of
    // the true quantile position
    val rows = for (g <- Seq("a", "b"); v <- 1 to 1000)
      yield Row(g, v.toDouble * (if (g == "a") 1 else 3))
    val in = df("g STRING, v DOUBLE", rows)
    val out = Sampling.approxQuantiles(in, Seq("g"), "v",
        Seq(0.25, 0.5, 0.9), Seq("q25", "q50", "q90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val scaleOf = Map("a" -> 1.0, "b" -> 3.0)
    for ((g, (q25, q50, q90)) <- out) {
      val s = scaleOf(g)
      // each must be an actual data point of its group...
      Seq(q25, q50, q90).foreach(q => assert((q / s) == math.rint(q / s) && q >= s && q <= 1000 * s))
      // ...within one rank of the exact quantile position
      assert(math.abs(q25 / s - 250.0) <= 1.0)
      assert(math.abs(q50 / s - 500.0) <= 1.0)
      assert(math.abs(q90 / s - 900.0) <= 1.0)
    }
    assert(out.size === 2)
  }

  test("repeatByWeight emits floor(w) copies plus a fractional-part draw") {
    val in = df("id LONG, s STRING", Seq(
      Row(1L, "a"), Row(2L, "a"),   // w = 2.0: exactly two copies each
      Row(3L, "b"),                 // w = 0.0: dropped
      Row(4L, "c")))                // default w = 1.0: exactly one copy
    val out = Sampling.repeatByWeight(in, "s", "id",
        Map("a" -> 2.0, "b" -> 0.0), defaultWeight = 1.0)
      .select("id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out === Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L), (4L, 0L)).sorted)
  }

  test("repeatByWeight fractional copies are 2-or-3 at w=2.5, rerun-stable") {
    val in = df("id LONG, s STRING", (0L until 200L).map(Row(_, "a")))
    val run = Sampling.repeatByWeight(in, "s", "id", Map("a" -> 2.5))
    val counts = run.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size === 200)
    assert(counts.values.forall(c => c == 2L || c == 3L))
    // expected copies ~= 2.5 per row; the md5 draw keeps it near that
    val total = counts.values.sum
    assert(total > 200 * 2.2 && total < 200 * 2.8)
    // epochs are contiguous 0..n-1 per id
    val epochs = run.groupBy("id").agg(
        min("epoch").as("mn"), max("epoch").as("mx"), count(lit(1)).as("n"))
      .collect()
    assert(epochs.forall(r => r.getLong(1) == 0L && r.getLong(2) == r.getLong(3) - 1))
    // content-addressed: a re-partitioned rerun selects the identical multiset
    val again = Sampling.repeatByWeight(in.repartition(7), "s", "id", Map("a" -> 2.5))
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === counts)
  }

  test("filterByGroupMean drops whole low-mean groups, null group included") {
    val in = df("id LONG, g STRING, q DOUBLE", Seq(
      Row(1L, "good", 0.8), Row(2L, "good", 0.6),   // mean 0.7 -> kept
      Row(3L, "bad", 0.2), Row(4L, "bad", 0.9),     // mean 0.55 -> dropped
      Row(5L, null, 0.1)))                          // null group, mean 0.1 -> dropped
    val kept = Sampling.filterByGroupMean(in, "g", "q", minMean = 0.6)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L))
    // the decision compares the ROUNDED mean: 0.54995 rounds to 0.55 >= 0.55
    val edge = df("id LONG, g STRING, q DOUBLE", Seq(
      Row(1L, "e", 0.5499), Row(2L, "e", 0.5500)))
    assert(Sampling.filterByGroupMean(edge, "g", "q", 0.55).count() === 2)
  }

  test("assignSplits covers every row, is rerun- and partitioning-stable") {
    val in = df("id LONG, x STRING", (0L until 400L).map(Row(_, "v")))
    val splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val out = Sampling.assignSplits(in, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.size === 400)
    val byName = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byName.keySet === Set("train", "val", "test"))
    // binomial bounds, generous: 400 draws at 0.75 / 0.125
    assert(byName("train") > 250 && byName("train") < 350)
    assert(byName("val") > 20 && byName("val") < 90)
    assert(byName("test") > 20 && byName("test") < 90)
    val again = Sampling.assignSplits(in.repartition(7), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(again === out)
    // fractions must sum to 1
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(in, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }
}
