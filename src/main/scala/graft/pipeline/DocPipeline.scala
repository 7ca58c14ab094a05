package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}

/** Stage toggles + knobs of [[DocPipeline]]. Every stage is opt-out so a
  * recipe can run any prefix/subset, mirroring the skip matrix the
  * datacube [[Pipeline]] exposes. */
final case class DocPipelineConfig(
    dedupExact: Boolean = true,
    qualityGate: Boolean = true,
    decontaminate: Boolean = true,
    contaminationN: Int = 3,
    contaminationMaxFrac: Double = 0.05,
    dedupNear: Boolean = false,
    nearShingleN: Int = 3,
    nearNumHashes: Int = 64,
    nearBands: Int = 16,
    nearMinSigAgreement: Option[Double] = None,
    tokenBudget: Option[Long] = None,
    checkpointDir: Option[String] = None,
    // kept-frame semi-join tiers (see KeepJoin): raise on big-executor
    // clusters, lower for memory-tight ones
    keepIdsBroadcastLimit: Long = KeepJoin.BroadcastIdLimit,
    keepIdsBloomLimit: Long = KeepJoin.BloomIdLimit)

final case class DocPipelineResult(kept: DataFrame, summary: DataFrame)

/** [[DocPipeline.incrementalCurate]]'s three faces: the full diff surface
  * (id, status), the re-scored delta (id, keep — added+changed docs ONLY,
  * the work-proportionality witness), and the next standing kept corpus
  * (the input schema). */
final case class IncrementalCurationResult(
    diff: DataFrame, rescored: DataFrame, keptNext: DataFrame)

/** The LLM-side counterpart of the datacube [[Pipeline]]: one entry
  * point that runs a curation RECIPE — exact dedup → quality gate →
  * decontamination → token-budget selection — over a document corpus,
  * composed entirely from the oracle-gated operators, and returns both
  * the kept corpus and a per-stage funnel summary (stage, n_in, n_out).
  *
  * Execution contract — the stages refine an ID SET, never the corpus:
  * every per-document signal a stage decides on (content hash, quality
  * keep flag, quality score, token count) is computed in ONE projection
  * over the corpus text, and only that metadata frame (~50 bytes/doc;
  * ~½ KB/doc when `dedupNear` adds the 64-minima MinHash signature) is
  * ever pinned (`localCheckpoint` by default, a reliable parquet spill
  * under `cfg.checkpointDir` when set — see [[Pin]]); the contamination
  * fraction — the one signal
  * needing its own aggregation shape (shingle explode + benchmark
  * semi-join) — is doc-local, so it too is computed once up front and
  * joined into the metadata regardless of what earlier stages drop.
  * The gate stages are then SEQUENTIAL SURVIVAL FLAGS on that one
  * metadata frame (each stage's flag = previous flag AND its own rule),
  * so the whole funnel's n_in/n_out column is ONE aggregation job, not a
  * checkpoint-and-count per stage; only the token-budget stage — whose
  * greedy selection needs a sort + prefix sum — runs as its own job over
  * the survivors. The kept corpus is a single final semi-join of the
  * input against the surviving ids. At 100 TB the corpus text is READ
  * exactly twice (signal projection; contamination scan — both
  * column-pruned parquet scans) and WRITTEN/checkpointed zero times,
  * where the previous design checkpointed the full text frame after
  * every stage and computed the stats struct twice.
  *
  * Stage semantics (all identical to their standalone operators):
  *  - exact dedup: keep the min-id document per normalized content hash
  *    ([[Dedup.exactDedup]]);
  *  - quality gate: [[TextFunctions.qualityFilter]]'s composite keep;
  *  - decontamination: drop documents whose contaminated-shingle
  *    fraction against `evalDocs` exceeds `contaminationMaxFrac`
  *    ([[Dedup.contaminationScan]] — doc-local fractions, so the
  *    decision is independent of what earlier stages dropped; docs too
  *    short to shingle have a null fraction and are kept, matching
  *    [[Dedup.decontaminate]]);
  *  - near dedup (opt-in, 35_near_dedup): MinHash-LSH banded candidates
  *    over the SURVIVORS' signatures
  *    ([[Dedup.minHashCandidatesFromSignatures]] — the signature is one
  *    more column of the signal projection, never a second text scan),
  *    optionally VERIFIED by signature agreement
  *    (`nearMinSigAgreement`: the equal-component fraction estimates
  *    the pair's Jaccard, tightening the banded s-curve into a hard
  *    threshold with no text re-read) →
  *    [[Dedup.connectedComponents]] → keep each cluster's min id; docs
  *    too short to shingle are their own identity. The crawl-side
  *    [[CrawlPipeline]] composes the same shape with SimHash — the two
  *    orchestrators demonstrate both near-dup families;
  *  - token budget: greedy max-quality selection under a global token
  *    budget ([[Sampling.selectByBudget]] on (quality_score, n_tokens)).
  */
object DocPipeline {

  def run(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      evalDocs: Option[DataFrame],
      cfg: DocPipelineConfig = DocPipelineConfig()
  ): DocPipelineResult = {
    val spark = docs.sparkSession
    val doDedup = cfg.dedupExact
    val doQuality = cfg.qualityGate
    val doDecon = cfg.decontaminate && evalDocs.nonEmpty
    val doNear = cfg.dedupNear
    val doBudget = cfg.tokenBudget.nonEmpty
    val stages = Seq.newBuilder[(String, Long, Long)]

    if (!doDedup && !doQuality && !doDecon && !doNear && !doBudget) {
      // nothing to decide: the input passes through untouched (same frame,
      // not a self-semi-join — duplicate ids survive as they arrived)
      val n = docs.count()
      stages += (("00_input", n, n))
      return DocPipelineResult(docs,
        spark.createDataFrame(stages.result()).toDF("stage", "n_in", "n_out"))
    }

    // the single signal projection: only the signals enabled stages will
    // read are computed (md5-normalization is not free when dedup is off).
    // textStats/qualityFilter share rawStats subexpressions; within one
    // projection Spark's subexpression elimination evaluates them once.
    val sigCols: Seq[Column] =
      Seq(col(idCol).as("_id")) ++
        (if (doDedup)
          Seq(md5(expr(Dedup.normalizedSql(textCol))).as("_hash"))
        else Nil) ++
        (if (doQuality)
          Seq(TextFunctions.qualityFilter(textCol).getField("keep").as("_keep"))
        else Nil) ++
        (if (doNear)
          // MinHash signature (~8 bytes x numHashes per doc) computed in
          // the SAME projection — the near stage never re-reads the text
          Seq(Dedup.minHashSigCol(textCol, cfg.nearShingleN,
            cfg.nearNumHashes, docs.sparkSession).as("_sig"))
        else Nil) ++
        (if (doBudget)
          Seq(TextFunctions.textStats(textCol).getField("quality_score").as("_q"),
            TextFunctions.textStats(textCol).getField("n_tokens")
              .cast("long").as("_nt"))
        else Nil)
    var meta = docs.select(sigCols: _*)
    if (doDecon) {
      val frac = Dedup.contaminationScan(docs, evalDocs.get, idCol, textCol,
          cfg.contaminationN)
        .select(col("doc_id").as("_id"), col("contamination").as("_contam"))
      meta = meta.join(frac, Seq("_id"), "left")
    }

    // sequential survival flags: each enabled gate ANDs its rule onto the
    // previous stage's flag. The dedup rule needs the per-hash min id —
    // one window exchange inside the same plan. With dedupNear also on,
    // the ~½ KB/doc signature rides this exchange; accepted DELIBERATELY:
    // every alternative ships the same signature bytes through some other
    // single metadata exchange instead (a narrow-window + join-back re-
    // keys the wide frame by _hash or _id — same bytes; a separate sig
    // sliver re-joining the survivors exchanges (id, sig) — same bytes;
    // banding ALL docs and filtering pairs to survivors pays the 16-band
    // explode on non-survivors — more). The near stage's own band
    // exchange (~640 B/doc) dominates regardless, and everything here is
    // still metadata — the corpus text never shuffles.
    if (doDedup)
      meta = meta.withColumn("_canon",
        min(col("_id")).over(Window.partitionBy("_hash")))
    var survive = lit(true)
    val gateFlags = Seq.newBuilder[String]   // flag col per enabled gate
    val gateNames = Seq.newBuilder[String]
    def gate(name: String, flag: String, enabled: Boolean)(rule: Column): Unit =
      if (enabled) {
        survive = survive && rule
        meta = meta.withColumn(flag, survive)
        gateFlags += flag; gateNames += name
      }
    gate("10_exact_dedup", "_s_dedup", doDedup)(col("_id") === col("_canon"))
    gate("20_quality_gate", "_s_qual", doQuality)(col("_keep"))
    gate("30_decontaminate", "_s_decon", doDecon)(
      // null fraction (too short to shingle) keeps, like the standalone op
      col("_contam").isNull || col("_contam") <= cfg.contaminationMaxFrac)

    val flags = gateFlags.result()
    val m = Pin.pin(meta, cfg.checkpointDir).df
    // the whole gate funnel counted in ONE aggregation job
    val countCols = count(lit(1)).as("_n0") +:
      flags.map(f => sum(when(col(f), 1L).otherwise(0L)).as(s"_n$f"))
    val countsRow = m.agg(countCols.head, countCols.tail: _*).collect()(0)
    // sum() over zero rows is NULL, not 0 — an empty corpus must produce
    // an all-zero funnel, not an NPE
    val funnel: Seq[Long] = (0 to flags.size).map(i =>
      if (countsRow.isNullAt(i)) 0L else countsRow.getLong(i))
    stages += (("00_input", funnel.head, funnel.head))
    gateNames.result().zipWithIndex.foreach { case (name, i) =>
      stages += ((name, funnel(i), funnel(i + 1)))
    }

    val lastFlag = flags.lastOption.map(col).getOrElse(lit(true))
    var surv = m.filter(lastFlag)
    var nCur = funnel.last
    if (doNear) {
      // near-dedup over the surviving (id, signature) sliver — banded
      // candidates, components, drop non-canonical members. Its own
      // jobs (the banded self-join + CC iterations have their own plan
      // shapes), but still metadata-only work: the signatures came off
      // the one signal projection, the text is never re-read. Docs too
      // short to shingle carry a NULL signature, pair with nothing, and
      // survive as their own identity.
      val pairs = Dedup.minHashCandidatesFromSignatures(
        surv.select(col("_id").as("doc_id"), col("_sig").as("sig")),
        cfg.nearNumHashes, cfg.nearBands, cfg.nearMinSigAgreement)
      val ccDir = cfg.checkpointDir
        .map(d => s"$d/cc-scratch-${java.util.UUID.randomUUID()}")
      val labels = Dedup.connectedComponents(pairs, checkpointDir = ccDir)
      val dropIds = labels.filter(col("component") =!= col("doc_id"))
        .select(col("doc_id").as("_drop_id"))
      // id-only pin — lets the CC result be released/deleted NOW instead
      // of leaking while downstream stages lazily reference it
      val keptIds = Pin.pin(
        surv.select(col("_id"))
          .join(dropIds, col("_id") === col("_drop_id"), "left_anti"),
        cfg.checkpointDir).df
      val nNear = keptIds.count()
      stages += (("35_near_dedup", nCur, nNear))
      Dedup.release(labels)
      ccDir.foreach(Pin.dropPath(spark, _))
      surv = surv.join(keptIds.select(col("_id").as("_keep_id")),
        col("_id") === col("_keep_id"), "left_semi")
      nCur = nNear
    }
    var finalIds = surv.select(col("_id"))
    var finalCount = nCur
    cfg.tokenBudget.foreach { budget =>
      val picked = Sampling
        .selectByBudget(surv.select(col("_id"), col("_q"), col("_nt")),
          "_id", "_q", "_nt", budget)
        .select(col("_id"))
      val nPicked = picked.count()
      stages += (("40_token_budget", nCur, nPicked))
      finalIds = picked
      finalCount = nPicked
    }
    // size-gated final semi-join (KeepJoin): the funnel already counted
    // the surviving ids, so the id sliver broadcasts when it fits and
    // the corpus text never serializes into shuffle files — the same
    // sf10-measured fix as CrawlPipeline's kept frame
    val kept = KeepJoin.semi(docs, docs(idCol), finalIds, "_id", finalCount,
      cfg.keepIdsBroadcastLimit, cfg.keepIdsBloomLimit)
    val summary = spark.createDataFrame(stages.result())
      .toDF("stage", "n_in", "n_out")
    DocPipelineResult(kept, summary)
  }

  /** The STEADY-STATE curation loop — the incremental analogue of [[run]]
    * for a corpus that re-snapshots continuously: diff the snapshots
    * ([[Dedup.corpusDiff]] — one hash pass, the only work that touches
    * unchanged text), re-run the quality gate over the CHANGED sliver
    * only (added + changed ids — the unchanged corpus is never re-scored,
    * re-shingled, or re-indexed, so per-round cost is delta-proportional,
    * the [[graft.operators.Frontier.mergeSchedule]] discipline applied to
    * curation), then update the standing kept corpus in one pass:
    * [[Dedup.mergeUpsert]] replaces re-decided keys with their keepers,
    * and an eviction anti-join drops removed ids and
    * changed-but-now-failing ids. Standing-index maintenance composes on
    * the OUTPUT slivers: the ADDED keepers are exactly what
    * [[graft.io.TextIndex.appendToIndex]] / [[graft.io.BandIndex
    * .appendToIndex]] take (id-disjoint by construction —
    * PipelineComposeSpec pins the composed equality).
    *
    * CONVERGENCE CONTRACT (what the w11 oracle adjudicates): when
    * `standingKept` is the gate's output over `prevSnapshot` and ids are
    * unique per snapshot, `keptNext` equals the gate run from scratch
    * over `curSnapshot` — incremental maintenance never drifts from the
    * batch result. An unchanged doc's membership is its standing
    * decision (same text ⇒ same gate), a changed/added doc's is its
    * fresh score, a removed doc is gone.
    *
    * `standingKept` must share `curSnapshot`'s schema (the
    * [[Dedup.mergeUpsert]] contract). The gate is
    * [[TextFunctions.qualityFilter]]'s composite keep — [[run]]'s
    * quality stage, re-expressed over the delta. */
  def incrementalCurate(
      prevSnapshot: DataFrame,
      curSnapshot: DataFrame,
      standingKept: DataFrame,
      idCol: String,
      textCol: String
  ): IncrementalCurationResult = {
    require(standingKept.columns.sameElements(curSnapshot.columns),
      "standingKept must share curSnapshot's schema (mergeUpsert's contract)")
    val diff = Dedup.corpusDiff(prevSnapshot, curSnapshot, idCol, textCol)
    // the changed sliver: metadata-sized id frame, semi-joined so the
    // score projection sits ABOVE the delta restriction — only delta
    // rows ever reach the gate expression
    val deltaIds = diff.filter(col("status").isin("added", "changed"))
      .select(col(idCol))
    val delta = curSnapshot.join(deltaIds, Seq(idCol), "left_semi")
    val scored = delta.withColumn("__graft_keep",
      TextFunctions.qualityFilter(textCol).getField("keep"))
    val rescored = scored.select(col(idCol), col("__graft_keep").as("keep"))
    val deltaKept = scored.filter(col("__graft_keep")).drop("__graft_keep")
    // evictions: snapshot-removed ids + changed-docs the gate now fails.
    // "fails" = keep IS NOT TRUE, not `!keep`: a NULL keep (e.g. the
    // gate over null text) drops out of BOTH deltaKept's filter and a
    // bare `!keep`, which would leave the doc's STALE standing row alive
    // and break the convergence contract (the batch gate excludes it)
    val evictIds = diff.filter(col("status") === "removed").select(col(idCol))
      .unionByName(rescored
        .filter(!coalesce(col("keep"), lit(false))).select(col(idCol)))
    val keptNext = Dedup.mergeUpsert(standingKept, deltaKept, Seq(idCol))
      .join(evictIds, Seq(idCol), "left_anti")
    IncrementalCurationResult(diff, rescored, keptNext)
  }
}
