package graft.io

import org.apache.spark.sql.{Column, DataFrame}

/** Clustered parquet layout: range-partition on a clustering key and sort
  * within partitions before writing, so every output file owns one
  * contiguous, (near-)disjoint key range and parquet min/max statistics
  * prune file- and row-group-level on key-range predicates.
  *
  * Paired with [[graft.operators.TileMath.zorder]] this is Z-ORDER
  * clustering (the Delta/Iceberg layout optimization): 2-D-adjacent tiles
  * share Z prefixes, a parent tile at `d` zooms up owns exactly the Z
  * range `[z << 2d, (z+1) << 2d)`, so a viewport scan of a 100 TB tile
  * store reads a handful of contiguous files instead of striding all of
  * them. The same call clusters any sortable key (timestamp for
  * time-range scans, domain for per-site reads).
  *
  * `repartitionByRange` samples the key distribution (one extra pass over
  * the input via Spark's RangePartitioner sampling) to place balanced
  * boundaries — skewed keys get more files, empty ranges none.
  */
object Layout {

  def writeClustered(
      df: DataFrame,
      key: Column,
      numFiles: Int,
      path: String
  ): Unit =
    df.repartitionByRange(numFiles, key)
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Bucketed co-located layout: hash-bucket the table on a join key at
    * WRITE time (`bucketBy` + in-bucket sort, catalog-registered), so the
    * bucketing IS a persisted HashPartitioning. Two tables bucketed on
    * the same key with the same bucket count join with ZERO shuffles —
    * the scan itself satisfies the join's distribution requirement
    * (LayoutSpec proves it on the executed plan). This is the standing
    * answer to a repeated big join: at 100 TB, shuffling either side per
    * query dwarfs every other cost, and pre-bucketing moves that shuffle
    * to ingest where it is paid ONCE. Pick a bucket count that holds
    * per-bucket data at a comfortable task size at the target scale —
    * bucket count, unlike shuffle partitions, cannot adapt at read
    * time. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int
  ): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** Read a partitioned data tree through a 0-row schema sidecar when
    * one exists — the ONE copy of the day-zero read guard (r18 review:
    * it was hand-rolled in [[TextIndex]] and [[BandIndex]]; the
    * [[CorpusStore]] original keeps its own because it also rewrites
    * the bucket column's type). A DAY-ZERO tree (built from an empty
    * frame) has no parquet footer to infer a schema from, so inference
    * throws; the sidecar — written by the build face as `limit(0)` of
    * the exact tree shape — keeps the read well-typed and an empty
    * tree serves an empty frame. Trees written before the sidecar
    * existed fall back to inference, which works there: they were
    * necessarily built non-empty. */
  private[graft] def sidecarRead(
      spark: org.apache.spark.sql.SparkSession,
      dataDir: String, schemaDir: String): DataFrame =
    sidecarSchema(spark, schemaDir) match {
      case Some(s) => spark.read.schema(s).parquet(dataDir)
      case None => spark.read.parquet(dataDir)
    }

  /** The 0-row sidecar's schema when one exists — shared by the
    * listing read above and the [[Manifest]] snapshot reads (which
    * need the schema separately, to type a day-zero empty sliver). */
  private[graft] def sidecarSchema(
      spark: org.apache.spark.sql.SparkSession, schemaDir: String
  ): Option[org.apache.spark.sql.types.StructType] = {
    val schemaPath = new org.apache.hadoop.fs.Path(schemaDir)
    val fs = schemaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(schemaPath))
      Some(spark.read.parquet(schemaDir).schema)
    else None
  }
}
