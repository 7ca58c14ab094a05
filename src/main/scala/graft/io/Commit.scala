package graft.io

import org.apache.spark.sql.SparkSession

/** Engine-owned commit sentinel: a zero-byte `_GRAFT_COMMIT` file the
  * writer creates itself AFTER a directory's content write returns.
  *
  * Why not the committer's `_SUCCESS`: every crash-recovery gate in
  * this package (the [[BucketRewrite]] journal, [[SeenSet]]'s torn-emit
  * and Bloom-recovery checks) used to key on `_SUCCESS`, which only
  * exists when `mapreduce.fileoutputcommitter.marksuccessfuljobs` is
  * true AND the committer in use writes it — cloud-optimized committers
  * may not. Under such a config a COMMITTED journal would read as
  * uncommitted and be silently dropped on recover, permanently losing
  * the bucket the journal exists to protect (r17 advisory). Creating
  * our own marker removes the config dependency: the sentinel exists
  * iff the writer's own control flow reached the line after the write,
  * on any filesystem and committer.
  *
  * The underscore prefix keeps it invisible to Spark's file-source
  * listing (the same hidden-file convention `_SUCCESS` rides). An
  * `overwrite`-mode rewrite of the directory deletes the old sentinel
  * with the old content, so a torn rewrite reads uncommitted — exactly
  * the semantics the gates need. */
private[graft] object Commit {

  val Marker = "_GRAFT_COMMIT"

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Create the sentinel under `dir`. Call only after the content write
    * has returned (the write's success is what the marker asserts). */
  def mark(spark: SparkSession, dir: String): Unit =
    fsOf(spark, dir)
      .create(new org.apache.hadoop.fs.Path(s"$dir/$Marker"), true)
      .close()

  /** True iff the writer marked `dir` committed. */
  def isCommitted(spark: SparkSession, dir: String): Boolean =
    fsOf(spark, dir).exists(new org.apache.hadoop.fs.Path(s"$dir/$Marker"))
}
