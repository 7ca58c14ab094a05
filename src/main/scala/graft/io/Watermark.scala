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
  * faces at once. */
private[io] object Watermark {

  def read(spark: SparkSession, indexDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/watermark")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else spark.read.parquet(p.toString)
      .agg(max(col("batch_id").cast("long"))).head().getLong(0)
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
