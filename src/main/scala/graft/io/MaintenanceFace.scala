package graft.io

import org.apache.spark.sql.SparkSession

/** The ONE watermark-gated maintenance skeleton shared by every
  * persisted-family streaming face ([[BandIndex.appendBatch]],
  * [[TextIndex.appendBatch]], [[SeenSet.dedupBatch]],
  * [[CorpusStore.applyCurationBatch]]) and their
  * [[graft.streaming.Streaming]] foreachBatch bodies. Before r18 each
  * face hand-rolled the same gate + advance + compaction-cadence
  * control flow, so a hardening (e.g. the [[Watermark]] torn-marker
  * fix) had four landing sites; now the protocol lives here once and
  * the faces supply only their apply body.
  *
  * The contract the skeleton enforces (each face's scaladoc argues its
  * own apply body is safe under it):
  *  - `batchId <= watermark` → the whole body is a no-op (Structured
  *    Streaming's replay of the last uncommitted batch after a
  *    restart);
  *  - otherwise the face's `apply` runs, then the watermark advances —
  *    so the one unprotected window (apply done, marker not advanced)
  *    replays the apply, which every face makes idempotent or
  *    tolerate-and-heal;
  *  - compaction (when a cadence is configured) runs only on APPLIED
  *    batches — a replayed no-op batch must not re-compact — and only
  *    every `compactEvery`-th batch, bounding serve-path file fan-in at
  *    ~`compactEvery` files per bucket. */
private[graft] object MaintenanceFace {

  /** Run one watermark-gated batch: skip if `batchId` is at or below
    * the artifact's stored watermark, else run `apply` and advance the
    * marker. Returns true iff applied. */
  def gated(spark: SparkSession, dir: String, batchId: Long)
      (apply: => Unit): Boolean =
    if (batchId <= Watermark.read(spark, dir)) false
    else {
      apply
      Watermark.advance(spark, dir, batchId)
      true
    }

  /** The shared foreachBatch body: one already-gated apply (a face's
    * `appendBatch`/`dedupBatch`, which routes through [[gated]]) plus
    * the compaction cadence. `compactEvery <= 0` disables compaction
    * (the right value for families whose maintenance rewrites whole
    * bucket directories and so never fragments — [[CorpusStore]]).
    * Returns true iff the batch was applied. */
  def step(batchId: Long, compactEvery: Int)
      (apply: => Boolean)(compact: => Unit): Boolean = {
    val applied = apply
    if (applied && compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      compact
    applied
  }
}
