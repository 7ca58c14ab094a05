package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, id-bucketed standing corpus with DELTA-PROPORTIONAL keyed
  * maintenance — the on-disk home of the curation loop's kept set (the
  * sixth persisted family): [[graft.operators.Dedup.mergeUpsert]] and
  * the eviction anti-join give the LOGICAL upsert/delete over
  * DataFrames, but materializing their output naively rewrites the
  * whole corpus per batch — at 100 TB that is the difference between a
  * nightly job and an impossibility. Here the corpus lives
  * `partitionBy(id_bucket)` (id_bucket = pmod(xxhash64(id), buckets)),
  * and a change batch rewrites ONLY the bucket directories its ids hash
  * into: read those buckets, anti-join the change keys, union the new
  * rows, dynamic-partition-overwrite those directories. Cost per batch
  * = (touched buckets) × (bucket size), delta-proportional when buckets
  * are sized so each holds a small slice (≈ corpus_bytes / 512 MB;
  * bucket count is fixed at write time — the [[Layout.writeBucketed]]
  * caveat).
  *
  * Crash posture (single writer — a streaming maintenance query — by
  * contract): both [[upsert]] and [[delete]] are IDEMPOTENT keyed
  * overwrites (re-applying the same batch to any half-applied state
  * converges to the same final rows), so the replay protocol is just
  * the [[Watermark]] gate — a torn dynamic overwrite (some buckets new,
  * some old) heals on the replayed apply. [[applyCurationBatch]]
  * packages gate + upsert + evict + watermark as the foreachBatch body
  * of [[graft.streaming.Streaming.curateStream]].
  *
  * Key-uniqueness is the caller's contract, exactly as
  * [[graft.operators.Dedup.mergeUpsert]] documents: the standing store
  * is key-unique by construction; a change batch with two rows for one
  * key would install both (upsert has no ordering column to pick a
  * winner by). Compact CDC batches to one change per key first. */
object CorpusStore {

  val DefaultBuckets = 64

  private def bucketOf(idCol: Column, buckets: Int): Column =
    pmod(xxhash64(idCol), lit(buckets.toLong))

  /** Build the store. `df` must be key-unique on `idCol`. A 0-row
    * `schema/` sidecar pins the logical schema so reads stay well-typed
    * even when maintenance legitimately empties the store (a fully
    * drained corpus has no parquet files to infer from). */
  def write(df: DataFrame, idCol: String, dir: String,
      buckets: Int = DefaultBuckets): Unit = {
    require(buckets >= 1, "need at least one bucket")
    val spark = df.sparkSession
    spark.createDataFrame(Seq(Tuple1(buckets))).toDF("buckets")
      .write.mode("overwrite").parquet(s"$dir/meta")
    df.limit(0).write.mode("overwrite").parquet(s"$dir/schema")
    df.withColumn("__graft_bucket", bucketOf(col(idCol), buckets))
      .repartition(col("__graft_bucket"))
      .write.mode("overwrite").partitionBy("__graft_bucket")
      .parquet(s"$dir/rows")
  }

  private def storedBuckets(spark: SparkSession, dir: String): Int =
    spark.read.parquet(s"$dir/meta")
      .select(col("buckets").cast("int")).head().getInt(0)

  /** The rows tree with a schema-stable `__graft_bucket: long` column —
    * read through the schema sidecar, so an emptied store is an empty
    * frame, not an inference error, and the partition column's
    * dirname-inferred int never leaks into a union. */
  private def rowsFrame(spark: SparkSession, dir: String): DataFrame = {
    val logical = spark.read.parquet(s"$dir/schema")
    val root = new org.apache.hadoop.fs.Path(s"$dir/rows")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBuckets = fs.exists(root) && fs.listStatus(root)
      .exists(_.getPath.getName.startsWith("__graft_bucket="))
    if (!hasBuckets)
      logical.withColumn("__graft_bucket", lit(null).cast("long"))
    else
      spark.read.schema(logical.schema).parquet(s"$dir/rows")
        .withColumn("__graft_bucket", col("__graft_bucket").cast("long"))
  }

  /** The standing corpus (layout column dropped). */
  def read(spark: SparkSession, dir: String): DataFrame =
    rowsFrame(spark, dir).drop("__graft_bucket")

  /** Keyed upsert: `delta` rows replace same-key standing rows, new keys
    * append — [[graft.operators.Dedup.mergeUpsert]] semantics, at
    * touched-buckets cost. `delta` must share [[read]]'s schema and be
    * key-unique. */
  def upsert(delta: DataFrame, idCol: String, dir: String): Unit =
    rewriteTouched(delta.sparkSession, dir,
      delta.withColumn("__graft_bucket",
        bucketOf(col(idCol), storedBuckets(delta.sparkSession, dir))),
      idCol, keepDelta = true)

  /** Keyed delete: standing rows whose id is in `ids` are removed;
    * absent ids are a no-op. `ids` needs only `idCol`. */
  def delete(ids: DataFrame, idCol: String, dir: String): Unit =
    rewriteTouched(ids.sparkSession, dir,
      ids.select(col(idCol)).withColumn("__graft_bucket",
        bucketOf(col(idCol), storedBuckets(ids.sparkSession, dir))),
      idCol, keepDelta = false)

  /** The shared rewrite: touched buckets = the change batch's distinct
    * buckets (metadata — at most `buckets` longs); standing rows of ONLY
    * those directories are read (partition-pruned — CorpusStoreSpec pins
    * it), change keys anti-joined away, delta rows unioned back for
    * upserts. The merged sliver is pinned (localCheckpoint) BEFORE the
    * write both because it severs the file-source lineage (Spark refuses
    * to overwrite a path a plan still reads) and because the write must
    * not re-derive it mid-overwrite. Dynamic partition overwrite only
    * replaces directories PRESENT in the output, so buckets a delete
    * emptied are removed explicitly afterwards — without that, an
    * emptied bucket's old directory would silently survive and resurrect
    * its rows. */
  private def rewriteTouched(spark: SparkSession, dir: String,
      flagged: DataFrame, idCol: String, keepDelta: Boolean): Unit = {
    val d = flagged.localCheckpoint()
    try {
      val touched = d.select(col("__graft_bucket")).distinct()
        .collect().map(_.getLong(0))
      if (touched.nonEmpty) {
        val standing = rowsFrame(spark, dir)
          .filter(col("__graft_bucket").isin(touched.toIndexedSeq: _*))
        val survivors = standing.join(d.select(col(idCol)), Seq(idCol), "left_anti")
        val merged0 = if (keepDelta) survivors.unionByName(d) else survivors
        val merged = merged0.localCheckpoint()
        try {
          merged.repartition(col("__graft_bucket"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__graft_bucket").parquet(s"$dir/rows")
          val nonEmpty = merged.select(col("__graft_bucket")).distinct()
            .collect().map(_.getLong(0)).toSet
          val fs = new org.apache.hadoop.fs.Path(s"$dir/rows")
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          touched.filterNot(nonEmpty).foreach { b =>
            fs.delete(
              new org.apache.hadoop.fs.Path(s"$dir/rows/__graft_bucket=$b"),
              true): Unit
          }
        } finally graft.operators.Dedup.release(merged)
      }
    } finally graft.operators.Dedup.release(d)
  }

  /** Replay-safe streaming curation: apply one CDC micro-batch —
    * `opCol` ∈ "upsert" / "delete" — through the quality gate into the
    * store, [[graft.pipeline.DocPipeline.incrementalCurate]]'s live
    * semantics: upserted docs that PASS the gate install (replacing any
    * stale standing row), upserted docs that fail — including a NULL
    * gate verdict, the keep-IS-NOT-TRUE rule — are EVICTED (their stale
    * standing row must not survive a doc's decay), deletes evict.
    * Returns true iff applied; the [[Watermark]] gate skips a restart's
    * replayed batch, and since upsert/delete are idempotent keyed
    * overwrites, the unprotected window (changes applied, marker not
    * advanced) converges on the replayed apply. One change per key per
    * batch is the caller's CDC-compaction contract. */
  def applyCurationBatch(batch: DataFrame, opCol: String, idCol: String,
      textCol: String, dir: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    if (batchId <= Watermark.read(spark, dir)) false
    else {
      val b = batch.localCheckpoint()
      try {
        val gated = b.filter(col(opCol) === "upsert").drop(opCol)
          .withColumn("__graft_keep",
            graft.functions.TextFunctions.qualityFilter(textCol)
              .getField("keep"))
        val kept = gated.filter(col("__graft_keep")).drop("__graft_keep")
        val evict = b.filter(col(opCol) === "delete").select(col(idCol))
          .unionByName(gated
            .filter(!coalesce(col("__graft_keep"), lit(false)))
            .select(col(idCol)))
        upsert(kept, idCol, dir)
        delete(evict, idCol, dir)
        Watermark.advance(spark, dir, batchId)
        true
      } finally graft.operators.Dedup.release(b)
    }
  }
}
