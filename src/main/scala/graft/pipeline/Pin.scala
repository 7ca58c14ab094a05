package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Metadata-frame pinning for the pipeline orchestrators.
  *
  * [[CrawlPipeline]] and [[DocPipeline]] pin their per-document metadata
  * frames so the funnel's downstream jobs (gate counting, near-dedup,
  * the final semi-join) re-read a materialized sliver instead of
  * re-running the corpus scan. `localCheckpoint()` is the right local
  * default — no write path needed, executor-memory blocks — but its
  * lineage-truncated blocks die with their executor: on a real cluster
  * an executor loss mid-funnel fails the whole job. Since the metadata
  * frame is ~100 bytes/page (tiny relative to the corpus at any scale),
  * pipelines accept a `checkpointDir` and spill it to parquet there —
  * a RELIABLE pin that survives executor loss on any Hadoop filesystem
  * and costs one metadata-sized write.
  *
  * Lifecycle: a pipeline [[drop]]s a pin as soon as a later pin
  * supersedes it, so a run leaves behind only the pins its RETURNED
  * frames still read (the gate metadata and the kept-id sliver — a few
  * metadata-sized files). The caller owns `checkpointDir` retention:
  * use a per-run directory and delete it after consuming/writing the
  * results; recurring jobs pointing one directory at every run would
  * otherwise accumulate those per-run leftovers. */
private[pipeline] object Pin {

  /** A pinned frame plus the on-disk path backing it (None for
    * localCheckpoint pins). */
  final case class Pinned(df: DataFrame, path: Option[String])

  /** Materialize `df` and truncate its lineage: parquet round-trip under
    * `dir` when given (reliable), `localCheckpoint()` otherwise. */
  def pin(df: DataFrame, dir: Option[String]): Pinned = dir match {
    case None => Pinned(df.localCheckpoint(), None)
    case Some(d) =>
      val path = s"$d/pin-${java.util.UUID.randomUUID()}"
      df.write.parquet(path)
      Pinned(df.sparkSession.read.parquet(path), Some(path))
  }

  /** Delete a SUPERSEDED pin's backing files — only call once nothing
    * the pipeline returns still reads it. No-op for localCheckpoint
    * pins (their blocks are freed by the ContextCleaner/JVM as before). */
  def drop(spark: SparkSession, p: Pinned): Unit =
    p.path.foreach(dropPath(spark, _))

  /** Recursively delete a spill path (a superseded pin or a scratch
    * subdirectory a pipeline handed to a downstream operator). */
  def dropPath(spark: SparkSession, path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
  }
}
