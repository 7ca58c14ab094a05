package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The single-row batch-id high-watermark marker shared by the
  * replay-safe streaming maintenance faces ([[BandIndex.appendBatch]],
  * [[SeenSet.dedupBatch]]): one parquet dir under the index holding the
  * highest committed micro-batch id. Reads take max(batch_id) over
  * whatever rows exist and treat an absent dir as -1, so a torn marker
  * overwrite (delete committed, crash before the new write) degrades to
  * a replayed — and by each face's own protocol, healed — append, never
  * a wrong skip. One copy of the protocol, so a hardening lands in both
  * faces at once.
  *
  * EVERY tear shape must read as -1, not throw (r17 verdict #2): the
  * overwrite's crash window can also leave the dir PRESENT but holding
  * only `_temporary/` (no committed parquet footer — schema inference
  * throws) or a committed-but-empty file set (max over zero rows is
  * null — getLong NPEs). Either would brick every subsequent
  * maintenance batch behind an exception until manual cleanup,
  * contradicting the degrades-to-a-replayed-append contract. So the
  * read checks for committed data files first, reads with an explicit
  * schema (never inference), and treats a null max as -1. */
private[graft] object Watermark {

  def read(spark: SparkSession, indexDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/watermark")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (!hasData) -1L
    else {
      val row = spark.read.schema("batch_id LONG").parquet(p.toString)
        .agg(max(col("batch_id"))).head()
      if (row.isNullAt(0)) -1L else row.getLong(0)
    }
  }

  def advance(spark: SparkSession, indexDir: String, batchId: Long): Unit = {
    import spark.implicits._
    Seq(batchId).toDF("batch_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/watermark")
  }

  /** Full-rebuild faces must clear the marker: a stale watermark from a
    * previous stream silently drops the first batches of a NEW stream
    * whose checkpoint restarts batch ids at 0 (review finding). */
  def clear(spark: SparkSession, indexDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/watermark")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true): Unit
  }
}
