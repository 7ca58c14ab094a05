package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucket-directory compaction for the append-maintained index families:
  * every [[TextIndex.appendToIndex]] / [[BandIndex.appendToIndex]] /
  * [[SeenSet.appendToSet]] adds one parquet file per touched bucket
  * directory, so after N append batches a probe's scan fan-in is N files
  * per bucket — the classic small-files decay of any append-only layout.
  * Compaction rewrites ONLY the fragmented directories (file count above
  * `maxFilesPerBucket`) back to one file each, content-identical, via
  * dynamic partition overwrite; untouched buckets keep their files
  * byte-for-byte.
  *
  * Crash-tolerant through [[BucketRewrite]]'s journal (dynamic
  * overwrite's per-directory delete-then-rename commit could otherwise
  * lose a bucket outright to a mid-commit crash); beyond that, torn
  * runs are harmless by content (compacted == fragmented), so re-running
  * converges. Run it from a maintenance window or the streaming
  * maintenance's own foreachBatch cadence (every Kth batch).
  *
  * `dedupCols` additionally collapses physically duplicated rows — the
  * residue a replayed streaming append can leave ([[BandIndex
  * .appendBatch]]'s crash window; [[SeenSet]]'s membership-idempotent
  * re-appends): the serving paths already tolerate those duplicates,
  * compaction with the family's natural key makes the tolerance free by
  * removing the bytes.
  *
  * Reader contract (r17 advisory): the dynamic overwrite replaces the
  * fragmented directories' files, so a CONCURRENT serving query in
  * ANOTHER process that listed those files before the rewrite can fail
  * mid-scan with FileNotFoundException. The single-maintainer contract
  * therefore extends to serving sessions: external readers either
  * probe between maintenance windows or retry on a lost-file failure —
  * the retried plan lists the compacted files and serves identical
  * results by construction (compacted == fragmented by content).
  * Within ONE driver JVM, serve and maintain interleave safely: plans
  * list files at execution start, the maintenance faces are
  * call-sequenced, and [[BucketRewrite]]'s per-tree lock serializes
  * journal recovery against the rewrite. */
object Compact {

  final case class CompactStats(
      bucketsCompacted: Int, filesBefore: Int, filesAfter: Int)

  def compactTree(
      spark: SparkSession, treeDir: String, bucketCol: String,
      dedupCols: Option[Seq[String]] = None, maxFilesPerBucket: Int = 1
  ): CompactStats = {
    require(maxFilesPerBucket >= 1, "a bucket keeps at least one file")
    BucketRewrite.recover(spark, treeDir, bucketCol)
    val root = new org.apache.hadoop.fs.Path(treeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return CompactStats(0, 0, 0)
    val dirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$bucketCol="))
    def parquetFiles(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    val fragmented = dirs
      .map(d => d.getPath.getName.stripPrefix(s"$bucketCol=").toLong ->
        parquetFiles(d.getPath))
      .filter(_._2 > maxFilesPerBucket)
    if (fragmented.isEmpty) return CompactStats(0, 0, 0)
    val values = fragmented.map(_._1).toIndexedSeq
    val base = spark.read.parquet(treeDir)
      .filter(col(bucketCol).isin(values: _*))
      .withColumn(bucketCol, col(bucketCol).cast("long"))
    val deduped = dedupCols.fold(base)(ks => base.dropDuplicates(ks))
    // pin before the self-overwrite (the CorpusStore.rewriteKeyed
    // reasoning: sever the file-source lineage, never re-derive
    // mid-write), then journal+overwrite: a bare dynamic overwrite's
    // delete-then-rename commit could LOSE a bucket to a mid-commit
    // crash (see [[BucketRewrite]])
    val pinned = deduped.localCheckpoint()
    try BucketRewrite.journaledOverwrite(spark, treeDir, bucketCol,
      values, pinned)
    finally graft.operators.Dedup.release(pinned)
    val after = values.map(v => parquetFiles(
      new org.apache.hadoop.fs.Path(s"$treeDir/$bucketCol=$v"))).sum
    CompactStats(values.size, fragmented.map(_._2).sum, after)
  }
}
