package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Keywords, Multimodal, Sampling, Similarity}

/** Physical-plan regression gate for the scale-bearing claims: the
  * per-row operator family must stay shuffle-free (scan speed on 100 TB),
  * and the distributed operators must keep their documented exchange
  * structure. Counts are taken from the AQE-disabled executedPlan over the
  * sf0.001 fixture — deterministic for a fixed input and config — so a
  * refactor that silently adds a corpus shuffle (or drops a broadcast)
  * fails here long before it costs anything on a cluster.
  */
class PlanShapeSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Embedding fixture pre-spread past the operators' under-split guard
    * (Similarity.spreadToCores) and checkpointed so the pin measures the
    * OPERATOR's exchanges, not the small-fixture repartition. */
  private lazy val embSpread = emb.repartition(8).localCheckpoint()

  /** Query-batch fixture, checkpointed so the pin doesn't count the
    * fixture limit's own single-partition exchange. */
  private lazy val embQueries = emb.limit(20).localCheckpoint()

  /** (shuffle exchanges, broadcast exchanges) of the final physical plan,
    * with AQE off so EnsureRequirements' output is inspected directly.
    * `autoBroadcast = false` additionally zeroes the size-based broadcast
    * threshold, for plans whose small sides sit near it — whether another
    * suite has cached the same fixture parquet changes its size statistics,
    * and a pin must not depend on ambient cache state (explicit
    * `broadcast()` hints are unaffected). */
  private def shape(mk: => DataFrame, autoBroadcast: Boolean = true): (Int, Int) = {
    val keys = Seq("spark.sql.adaptive.enabled") ++
      (if (autoBroadcast) Nil else Seq("spark.sql.autoBroadcastJoinThreshold"))
    val prev = keys.map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if (!autoBroadcast) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = mk.queryExecution.executedPlan
      (p.collect { case _: ShuffleExchangeExec => 1 }.size,
       p.collect { case _: BroadcastExchangeExec => 1 }.size)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("per-row curation operators are shuffle-free projections") {
    assert(shape(docs.select(TextFunctions.textStats("text"))) === ((0, 0)))
    assert(shape(docs.select(TextFunctions.qualityFilter("text"))) === ((0, 0)))
    assert(shape(docs.select(TextFunctions.compressionRatio("text"))) === ((0, 0)))
    assert(shape(docs.select(TextFunctions.simHash("text"))) === ((0, 0)))
    assert(shape(docs.select(TextFunctions.langId("text"))) === ((0, 0)))
    assert(shape(docs.select(TextFunctions.bpeTokenCount("text"))) === ((0, 0)))
    assert(shape(docs.selectExpr("nfc_normalize(text)")) === ((0, 0)))
    assert(shape(docs.selectExpr("strip_accents(text)")) === ((0, 0)))
    assert(shape(docs.selectExpr("fix_mojibake(text)")) === ((0, 0)))
    assert(shape(docs.selectExpr("luhn_scrub(text)")) === ((0, 0)))
    assert(shape(docs.select(TextFunctions.scriptProfile("text"))) === ((0, 0)))
    assert(shape(docs.select(TextFunctions.canonicalUrl(
      concat(lit("http://h"), col("doc_id"), lit(".co/p"))))) === ((0, 0)))
    assert(shape(docs.select(TextFunctions.jaroWinkler(
      col("lang"), col("source")))) === ((0, 0)))
  }

  test("dupSpans: hash window + island window + the zero-fill join, no pair join") {
    // 3 shuffles: the COUNT window on the 8-byte gram hash (corpus
    // frequency in place — gram STRINGS never shuffle), the per-doc
    // island window (the span groupBys reuse its doc_id partitioning),
    // and the docs side of the zero-fill join (the spans side rides the
    // island partitioning). A refactor that joins a dup-gram table back
    // (4th exchange + second hashing pass) or forms doc pairs fails here.
    assert(shape(Dedup.dupSpans(docs, "doc_id", "text"),
      autoBroadcast = false) === ((3, 0)))
  }

  test("cohortRetention: event-sized data dies at the first dedup, no join") {
    // 3 shuffles: the (user, period) dedup, the user-keyed cohort window
    // (the dedup's (user, period) hash partitioning does NOT cluster by
    // user alone), and the (cohort, offset) matrix aggregation — all on
    // user-period-sized rows after the first; 0 joins/broadcasts. A
    // refactor toward a first-activity join fails here.
    assert(shape(graft.operators.Retention.cohortRetention(
      docs.select(col("doc_id").as("u"), (col("doc_id") * 37 % 1000).as("ms")),
      "u", col("ms"), periodMs = 100L), autoBroadcast = false) === ((3, 0)))
  }

  test("dsirWeights top-K is a TakeOrdered, never a global rank window") {
    // Inspected on the LAZY form (the executing form checkpoints the
    // weight frame once and releases it after serving — its executed
    // plan is an opaque ExistingRDD). A refactor toward a global rank
    // window (single-partition sort of every document) fails both
    // assertions.
    val plan = Keywords.dsirWeightsLazy(docs, "doc_id", "text",
        docs.filter(col("lang") === "en"), topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Window"))
  }

  test("stratified sampling never shuffles (the determinism claim's twin)") {
    assert(shape(Sampling.stratifiedSample(
      docs, "doc_id", "lang", Map("en" -> 0.5), 0.25)) === ((0, 0)))
  }

  test("frontier schedule: one host exchange uncapped, skew-split + pruned capped") {
    // uncapped = ONE host exchange (a true global per-host sort).
    // capped = TWO: the pre-rank keys on (host, spark_partition_id), so
    // its exchange SPREADS a hot host across partitions (no single task
    // ever sorts a whole hot host) and the final host exchange then
    // ships only <= maxPerHost x partitions rows per host — bounded
    // sort memory at every stage, which is the property the cap exists
    // for. A refactor that collapses the pre-rank into a plain host
    // window (one exchange but an unbounded hot-host sort) fails here.
    val urls = docs.select(
      concat(lit("h"), col("doc_id") % 50).as("host"),
      concat(lit("http://h"), col("doc_id")).as("url"),
      (col("doc_id") % 11).as("priority"))
    assert(shape(graft.operators.Frontier.schedule(
      urls, "host", "url", "priority", 2, Some(5))) === ((2, 0)))
    assert(shape(graft.operators.Frontier.schedule(
      urls, "host", "url", "priority", 2, None)) === ((1, 0)))
  }

  test("frontier merge: delta-proportional — the standing queue never re-sorts") {
    // Exchanges belong to the MERGE only (standing is checkpointed):
    // the host-cardinality max-rank aggregation, the (host, url)
    // anti-join's two sides, and the delta's host re-key for the
    // base-rank join + window. The standing frame itself contributes
    // projections to union/join inputs but NO window sort — a refactor
    // that re-ranks the whole merged queue (frontier-sized window every
    // discovery round) adds a post-union exchange and fails here.
    val urls = docs.select(
      concat(lit("h"), col("doc_id") % 50).as("host"),
      concat(lit("http://h"), col("doc_id") % 200).as("url"),
      (col("doc_id") % 11).as("priority"))
      .groupBy("host", "url").agg(max("priority").as("priority"))
    val standing = graft.operators.Frontier.schedule(
      urls, "host", "url", "priority", 2).localCheckpoint()
    val delta = docs.select(
      concat(lit("h"), col("doc_id") % 50).as("host"),
      concat(lit("http://h"), col("doc_id") % 400).as("url"),
      (col("doc_id") % 13).as("priority"))
      .groupBy("host", "url").agg(max("priority").as("priority"))
      .localCheckpoint()
    assert(shape(graft.operators.Frontier.mergeSchedule(standing, delta,
      "host", "url", "priority", 2), autoBroadcast = false) === ((4, 0)))
  }

  test("semantic decontamination: eval broadcasts; statically 2 exchanges") {
    // 1 broadcast: the eval side under the nested-loop cross (the
    // flop-heavy half — corpus rows score against the broadcast, never
    // exchange for it). 2 shuffles on the AQE-OFF static plan: the
    // contaminated-id distinct (sliver-sized) and the corpus side of
    // the anti-join (stats-less sliver -> no static broadcast); at
    // runtime AQE broadcasts the id sliver and the corpus never
    // shuffles — the same posture as decontaminate/t25, deliberately
    // unhinted so a pathological low threshold (sliver ~ corpus) can't
    // OOM the driver with a forced broadcast.
    assert(shape(graft.operators.Dedup.semanticDecontaminate(
      emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding", 0.4))
      === ((2, 1)))
  }

  test("contamination scan: corpus aggregates, benchmark broadcasts") {
    // 3 shuffles: the two per-doc count aggregations + the doc-side
    // exchange of the assembly join; 3 broadcasts: the benchmark shingle
    // semi-join build + the (fixture-small) total/hits sides of the
    // assembly join — the corpus-side shingle stream itself never shuffles
    assert(shape(Dedup.contaminationScan(
      docs, docs.filter(col("doc_id") < 10), "doc_id", "text")) === ((3, 3)))
  }

  test("stupid backoff: count tables broadcast onto the scored stream") {
    // 2 shuffles: the trigram count table's aggregation (the one lazy LM
    // aggregate — bigram/unigram materialize at call time) and the final
    // per-doc aggregation; 5 broadcasts: every count-table lookup rides
    // the scored trigram stream as a broadcast hash join, so the stream
    // itself NEVER exchanges between the tokenize and the per-doc agg —
    // the t54 audit's shape, pinned. A refactor that turns a lookup into
    // a sort-merge join (corpus-sized stream shuffle per key role) fails
    // here.
    assert(shape(Keywords.stupidBackoffLogProb(
      docs, "doc_id", "text", docs.filter(col("doc_id") % 10 =!= 7)))
      === ((2, 5)))
  }

  test("dupShingleFraction: one window + one aggregation, no join") {
    // 2 shuffles: the COUNT window on the shingle hash (doc-frequency
    // per shingle, computed on the hashed stream in place) and the final
    // per-doc aggregation; 0 broadcasts/joins — a refactor back to the
    // count-aggregate + join-back form (a third exchange plus a second
    // md5 pass over every shingle for the join side) fails here.
    assert(shape(Dedup.dupShingleFraction(docs, "doc_id", "text")) === ((2, 0)))
  }

  test("temperature mix: corpus rows never shuffle; rates broadcast onto the scan") {
    // 2 shuffles, BOTH stratum-cardinality tiny (the per-stratum count
    // aggregation and the single-partition totals exchange — the rates
    // branch reuses the counts exchange); 2 broadcasts (totals into the
    // rate projection, rates onto the corpus scan). The corpus-row path
    // itself is a broadcast join + filter — zero corpus shuffles, the
    // determinism claim's twin, same as stratifiedSample.
    assert(shape(Sampling.temperatureMix(
      docs, "lang", "doc_id", 2.0, 0.3)) === ((2, 2)))
  }

  test("quantized top-k: scale and queries broadcast, two-phase rank") {
    // 3 shuffles: the global-max scale aggregation + the two rank windows
    // (pre-rank on (query_id, partition), final on per-partition
    // survivors); 2 broadcasts: the scale (reused across the corpus and
    // query quantize projections) and the quantized queries — the corpus
    // itself never shuffles before the k-pruned pre-rank.
    assert(shape(Similarity.quantizedTopK(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 3)) === ((3, 2)))
  }

  test("winnowing fingerprints are a shuffle-free projection off the scan") {
    // the native Winnow60 expression replaced the posexplode + doc-keyed
    // window shape (1 shuffle + per-doc sort) — a refactor that
    // reintroduces the window here fails
    assert(shape(Dedup.winnowFingerprints(docs, "doc_id", "text")) === ((0, 0)))
  }

  test("winnowing pairs meet only through the fingerprint-keyed join") {
    // 2 shuffles, both with map-side partials over the ~2/(window+1)-
    // thinned DISTINCT fingerprint stream: the per-doc size aggregation
    // and the pair aggregation (the old window's forced doc_id
    // partitioning let these reuse one exchange, but it shuffled and
    // SORTED every positional shingle row to get it — strictly more
    // data); 2 broadcasts: the fixture-small pair-join build and size
    // side (at corpus scale these degrade to joins keyed by wmin/doc
    // pair — the structural claim is that candidates only ever meet
    // through wmin).
    assert(shape(Dedup.winnowPairs(
      docs, "doc_id", "text", minShared = 2)) === ((2, 2)))
  }

  test("semDedup pairs die inside the cluster; assignment is a projection") {
    // 1 shuffle, 0 broadcasts: the native best_centroid argmax assigns
    // on the scan (no vector × k blow-up, no join, no broadcast), the
    // cent_id groupBy is the ONLY exchange, and pairs are generated and
    // scored inside the bucket aggregate by the generated BucketPairs
    // loop. The structural claim: candidates only ever meet through
    // cent_id, never an all-pairs corpus join.
    assert(shape(Dedup.semDedupPairs(
      embSpread, "vec_id", "embedding", 0.35, nClusters = 4, kmeansIters = 1),
      autoBroadcast = false) === ((1, 0)))
  }

  test("IVF top-k: assignment rides the scan; only query-sized exchanges remain") {
    // 2 shuffles, BOTH query-batch-sized (the nProbe window over query ×
    // centroid probes, the final per-query rank window); 2 broadcasts
    // (centroids into the probe join, probes onto the assignment stream).
    // The corpus path itself never exchanges: the native best_centroid
    // argmax assigns cells on the scan — a refactor that reintroduces the
    // corpus × k join + re-grouping aggregate fails here.
    assert(shape(Similarity.ivfTopK(
      embSpread, embSpread.limit(20), "vec_id", "embedding", k = 5,
      nCentroids = 8, nProbe = 2)) === ((2, 2)))
  }

  test("LSH ANN: the corpus is touched once; dedup and rank share one exchange") {
    // 1 shuffle (the query_id ranking window — cross-table dedup rides
    // the SAME exchange+sort via lag), 1 broadcast (the query bucket
    // table onto the corpus bucket stream). A refactor that re-fetches
    // candidate vectors through a corpus-keyed join, or dedups with a
    // separate (query, neighbor) aggregation, fails here.
    assert(shape(Similarity.annTopK(
      embSpread, embQueries, "vec_id", "embedding", k = 5,
      dims = 64, tables = 4, planesPerTable = 4)) === ((1, 1)))
  }

  test("PQ: encode is a projection; ADC top-k shuffles only the pruned ranks") {
    val books = Similarity.pqCodebooks(
      embSpread, "vec_id", "embedding", dims = 64, m = 4, codes = 8, iters = 1)
    // encode never exchanges — the index build rides the corpus scan
    assert(shape(Similarity.pqEncode(
      embSpread, "vec_id", "embedding", books)) === ((0, 0)))
    // 1 shuffle (the rank window, partial-group-limit-pruned map-side),
    // 1 broadcast (the per-query ADC tables onto the encoded stream) —
    // a refactor that joins corpus vectors back in fails here
    assert(shape(Similarity.pqTopK(
      embSpread, embQueries, "vec_id", "embedding", k = 3,
      dims = 64, m = 4, codes = 8, iters = 1)) === ((1, 1)))
  }

  test("IVF+PQ: one encoded-corpus projection, cell-keyed broadcast, one window") {
    // 1 shuffle (the final rank window — the nProbe window rides the
    // single-partition query fixture; at scale it adds one QUERY-BATCH-
    // sized exchange, never corpus-sized); 2 broadcasts (coarse
    // centroids into the probe join, the per-(query, cell) ADC tables
    // onto the encoded stream). The corpus path is a single projection
    // emitting (cell, pq_codes) — nothing vector-sized exchanges.
    assert(shape(Similarity.ivfPqTopK(
      embSpread, embQueries, "vec_id", "embedding", k = 3,
      dims = 64, nCentroids = 8, nProbe = 2, m = 4, codes = 8, iters = 1)) === ((1, 2)))
    // the residual (IVFADC) form keeps the identical serving shape: the
    // mean subtraction and code assignment ride the corpus projection,
    // the extra q·μ dot rides the broadcast ADC row — a refactor that
    // joins μ or the residuals in as a corpus-side table fails here
    assert(shape(Similarity.ivfPqResidualTopK(
      embSpread, embQueries, "vec_id", "embedding", k = 3,
      dims = 64, nCentroids = 8, nProbe = 2, m = 4, codes = 8, iters = 1)) === ((1, 2)))
  }

  test("embedding near-dup: one corpus exchange, pairs die inside the bucket") {
    // 2 shuffles: the (t, bucket) groupBy that carries each vector once
    // per table, and the cross-table dedup of the >= minCosine survivors;
    // 0 broadcasts, and critically NO join in the corpus path — pairs are
    // generated and scored inside the bucket aggregate, so a refactor
    // that reintroduces the candidate self-join + vector-fetch joins
    // (4 exchanges, candidates x 2 vectors of shuffle) fails here.
    assert(shape(Dedup.embeddingNearDupPairs(
      embSpread, "vec_id", "embedding", 0.4, dims = 64, tables = 4,
      planesPerTable = 4)) === ((2, 0)))
  }

  test("embedding near-dup cap: zero extra exchanges, no corpus join") {
    // the occupancy cap is a COUNT window on the same (t, bucket) key the
    // bucket groupBy shuffles on, so its exchange IS the groupBy's
    // exchange: the capped plan has the identical (2, 0) shape as the
    // uncapped one. A refactor that reintroduces a pre-count aggregation
    // + semi-join (a second LSH pass over the corpus, +1 shuffle,
    // +1 broadcast — the r9 d16 cost driver) fails here.
    assert(shape(Dedup.embeddingNearDupPairs(
      embSpread, "vec_id", "embedding", 0.4, dims = 64, tables = 4,
      planesPerTable = 4, maxBucketOccupancy = Some(30))) === ((2, 0)))
  }

  test("robots filter: the corpus never shuffles, robots broadcast") {
    // (1, 1): the ONE exchange is the one-row-per-host dedup on the
    // host-cardinality robots side (contract enforcement — duplicate
    // hosts would duplicate page rows through the left join); the
    // corpus side still never shuffles, the deduped robots table
    // broadcasts onto the page scan, and the decision runs in the
    // scan's mapPartitions — a refactor to a corpus-side shuffle join
    // or a per-page parse would change the shape
    import spark.implicits._
    val robots = Seq(("h0.com", "User-agent: *\nDisallow: /x\n"))
      .toDF("host", "robots_txt")
    val pages = docs.select(col("doc_id"),
      concat(lit("http://h"), col("doc_id") % 3, lit(".com/p")).as("url"))
    assert(shape(graft.operators.Robots.filterByRobots(
      pages, robots, "doc_id", "url",
      TextFunctions.urlHost(col("url")), "bot")) === ((1, 1)))
  }

  test("image near-dup: decode rides the scan once, pairs die in the bucket") {
    // 2 shuffles: the (band, bits) bucket groupBy (16-byte structs — the
    // pixels never shuffle) and the cross-band pair dedup; 0 broadcasts
    // and NO self-join — a refactor back to the banded self-join would
    // re-decode every image once per join side (the decode is the cost
    // here, unlike SimHash's scan-speed projection) and fails the pin.
    val payloads = docs.select(col("doc_id"),
      lit(Multimodal.encodePng(11, 6, (x, _) => (x * 20 << 16))).as("payload"))
    assert(shape(Multimodal.imageNearDupPairs(payloads, "doc_id")) === ((2, 0)))
  }

  test("recipe repeat never shuffles: copies are decided row-locally") {
    // the fractional-epoch draw is the stratifiedSample hash on the scan;
    // the explode multiplies rows in place — no exchange of any kind, so
    // materializing a 2.5x recipe over 100 TB is still one scan
    assert(shape(Sampling.repeatByWeight(
      docs, "lang", "doc_id", Map("en" -> 2.5), 0.5)) === ((0, 0)))
  }

  test("chunk strip: one chunk-hash window + one per-doc reassembly agg") {
    // 2 shuffles: the first-occurrence window keyed by the high-card
    // chunk hash, then the doc_id reassembly aggregation; no self-join —
    // a refactor that pairs chunks instead of windowing them fails here
    assert(shape(Dedup.stripDuplicateChunks(
      docs, "doc_id", "text", size = 32)) === ((2, 0)))
  }

  test("decontaminate: the scan's shape plus one broadcast-able anti-join") {
    // contaminationScan's (3, 3) plus the drop-set anti-join: the
    // contaminated-id side is filtered before the join, so at fixture
    // size (and at any realistic contamination rate) it broadcasts —
    // the kept corpus never shuffles
    assert(shape(Dedup.decontaminate(
      docs, docs.filter(col("doc_id") < 10), "doc_id", "text",
      maxFrac = 0.05)) === ((3, 4)))
  }

  test("minhash signatures are a shuffle-free projection off the scan") {
    // the native MinHash64 expression replaced the explode + doc-keyed
    // hash-agg shape (1 shuffle); only the downstream band join may
    // shuffle — a refactor that reintroduces the aggregate here fails
    assert(shape(Dedup.minHashSignatures(docs, "doc_id", "text")) === ((0, 0)))
  }

  test("HLL distinct: one register exchange + one per-key estimate agg") {
    // registers compact map-side to <= 2^p rows per (key, bucket) before
    // the exchange; the estimate aggregates the register frame only — a
    // refactor that shuffles raw values (the exact-distinct shape) fails
    assert(shape(graft.operators.Sketches.hllDistinct(
      docs.select(col("lang"), explode(TextFunctions.tokens("text")).as("t")),
      Seq("lang"), "t")) === ((2, 0)))
  }

  test("CMS top-k: counter + candidate aggs, counters broadcast for lookup") {
    // the token stream aggregates once into d*w counters and once into
    // candidates; the lookup join must BROADCAST the tiny counter frame —
    // a refactor that shuffles the corpus against the counters fails
    val (shuffles, broadcasts) = shape(graft.operators.Sketches.cmsTopK(
      docs.select(explode(TextFunctions.tokens("text")).as("t")), "t", k = 20))
    assert(broadcasts === 1 && shuffles <= 3, s"($shuffles, $broadcasts)")
  }

  test("split assignment never shuffles: the draw decides on the scan") {
    assert(shape(Sampling.assignSplits(docs, "doc_id",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))) === ((0, 0)))
  }

  test("domain filter: one group agg, failing groups broadcast into an anti-join") {
    // 1 shuffle: the per-group mean aggregation (domain-cardinality,
    // partials map-side); 1 broadcast: the failing-group set into the
    // anti-join — the corpus rows themselves never shuffle
    assert(shape(Sampling.filterByGroupMean(
      docs.select(col("doc_id"), col("source"), col("n_chars").cast("double").as("q")),
      "source", "q", minMean = 300.0)) === ((1, 1)))
  }

  test("unigram LM: vocab join is size-chosen, not hint-forced") {
    // the vocab (unigram counts) side carries NO broadcast hint — at
    // fixture size the planner's own estimate broadcasts it (1 hinted
    // broadcast for the 1-row totals + 1 size-based for the vocab), and
    // with the size-based path disabled the SAME plan degrades to a
    // shuffle join instead of failing or forcing an unbounded broadcast:
    // the 100 TB vocabulary contract.
    val broadcastShape = shape(Keywords.unigramLogProb(docs, "doc_id", "text"))
    val shuffleShape = shape(Keywords.unigramLogProb(docs, "doc_id", "text"),
      autoBroadcast = false)
    assert(broadcastShape._2 >= 2, s"vocab should broadcast at fixture size: $broadcastShape")
    assert(shuffleShape._2 === 1, s"only the hinted 1-row totals may broadcast: $shuffleShape")
    assert(shuffleShape._1 > broadcastShape._1, "vocab join must degrade to shuffle")
  }

  test("BM25 top-k: tf/df corpus aggs, vocab join, per-doc window") {
    // 6 shuffles: the (doc, term) tf aggregation; the df branch's (doc,
    // term) dedup (df derives from tf in the source, but column pruning
    // strips tf's aggregates from that branch into a plain distinct, so
    // the exchange cannot unify with tf's via ReuseExchange — a known
    // Catalyst limitation, both are distinct-pairs-sized, not
    // token-stream-sized); the term-keyed df aggregation (vocab-sized);
    // the tf side of the term join; the single-partition 1-row stats agg;
    // and the doc_id ranking window. 1 broadcast: the hinted 1-row stats
    // frame — the df side is deliberately unhinted (the Heaps'-law vocab
    // contract), so it must NOT appear as a broadcast here.
    val s = shape(Keywords.bm25TopTerms(docs, "doc_id", "text", 5),
      autoBroadcast = false)
    assert(s._2 === 1, s"only the 1-row stats frame may broadcast: $s")
    assert(s._1 === 6, s"BM25 exchange structure changed: $s")
  }

  test("budget selection never builds a global-order window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val sel = Sampling.selectByBudget(
      docs.select(col("doc_id"), lit(1.0).as("q"), lit(10L).as("c")),
      "doc_id", "q", "c", budget = 200L)
    val p = sel.queryExecution.executedPlan
    // the distributed prefix sum replaces SUM OVER (ORDER BY ...): the
    // result plan must contain neither a window nor a single-partition
    // exchange (the two fingerprints of the driver-sized-sort trap)
    assert(p.collect { case w: WindowExec => w }.isEmpty, "global window reintroduced")
    val singleParts = p.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }
    assert(singleParts.isEmpty, "single-partition exchange reintroduced")
  }

  test("eval carve pre-prunes before the stratum shuffle") {
    // 2 shuffles, one per rank window: the pre-rank keyed by (stratum,
    // input-partition) — high cardinality, prunes to n rows per partition
    // — and the final stratum-keyed rank over survivors only. A refactor
    // that drops the pre-prune (final window over the raw corpus) still
    // shows 2 exchanges but moves the full stratum through the second;
    // the companion semantics test in CurationOpsSpec catches that, this
    // pin catches added corpus exchanges.
    assert(shape(Sampling.takePerStratum(docs, "lang", "doc_id", 3)) === ((2, 0)))
  }

  test("brute-force top-k: queries broadcast, two-phase rank") {
    // 1 broadcast: the query vectors (never the corpus); 2 shuffles: the
    // pre-rank window on (query_id, partition) and the final rank on
    // query_id over per-partition survivors only
    assert(shape(Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 3)) === ((2, 1)))
  }

  test("windowFunnel: ONE corpus shuffle (the per-user aggregation)") {
    // the k-step chain is an aggregate fold — a refactor to the k-join
    // formulation (the oracle's shape) would show k extra exchanges
    import graft.operators.Funnel
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), (col("event_id") % 1000000).as("ts_ms"),
        col("event_type"))
    assert(shape(Funnel.windowFunnel(ev, "user_id", col("ts_ms"), "event_type",
      Seq("view", "click", "purchase"), 604800000L)) === ((1, 0)))
  }

  test("bigram LM: three count aggregations + hint-free joins, V broadcast") {
    // shuffles: bigram-count agg, left-count agg, the V count-distinct
    // pair, the two join-back exchanges of the bigram stream, and the
    // final per-doc rollup; exactly 1 broadcast: the 1-row V total.
    // With auto-broadcast off, the count tables join as shuffles — the
    // documented AQE-decides posture (no forced hints to pin).
    val (sh, bc) = shape(Keywords.bigramLogProb(docs, "doc_id", "text"),
      autoBroadcast = false)
    assert(bc === 1, s"V total must be the only forced broadcast, got $bc")
    assert(sh <= 8, s"bigram plan grew to $sh exchanges")
  }

  test("PageRank: checkpoint batching bounds the per-iteration JOB cost") {
    // pageRank returns an eagerly-checkpointed frame, so plan-shape
    // inspection of the result sees only a LogicalRDD scan — the
    // meaningful pin is the number of Spark JOBS the whole computation
    // schedules (what the every-2nd-iteration checkpoint batching and the
    // broadcast-contribution join optimize). Two extra iterations may add
    // at most one checkpoint job plus the iterations' broadcast-exchange
    // jobs; a regression to job-per-iteration (or worse, a re-shuffled
    // edge join) blows the delta immediately.
    import graft.operators.Graph
    val sc = spark.sparkContext
    val edges = spark.range(0, 200).selectExpr("id as src", "(id * 7) % 200 as dst")
      .unionAll(spark.range(0, 200).selectExpr("(id * 7) % 200 as src", "id as dst"))
      .localCheckpoint()
    def jobsFor(group: String, iters: Int): Int = {
      sc.setJobGroup(group, group)
      try Graph.pageRank(edges, "src", "dst", iters = iters).count()
      finally sc.clearJobGroup()
      sc.statusTracker.getJobIdsForGroup(group).length
    }
    val j2 = jobsFor("pr-pin-2", 2)
    val j4 = jobsFor("pr-pin-4", 4)
    // observed: 16 -> 22 (1 checkpoint main job + broadcast-exchange jobs
    // per batched pair of iterations); a job-per-iteration regression or
    // an edge re-shuffle roughly doubles the delta
    assert(j4 - j2 <= 7, s"two extra iterations cost ${j4 - j2} jobs ($j2 -> $j4)")
    assert(j2 <= 18, s"baseline pageRank schedules $j2 jobs")
  }
}
