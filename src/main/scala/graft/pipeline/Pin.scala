package graft.pipeline

import org.apache.spark.sql.DataFrame

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
  * and costs one metadata-sized write. */
private[pipeline] object Pin {

  /** Materialize `df` and truncate its lineage: parquet round-trip under
    * `dir` when given (reliable), `localCheckpoint()` otherwise. */
  def pin(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case None => df.localCheckpoint()
    case Some(d) =>
      val path = s"$d/pin-${java.util.UUID.randomUUID()}"
      df.write.parquet(path)
      df.sparkSession.read.parquet(path)
  }
}
