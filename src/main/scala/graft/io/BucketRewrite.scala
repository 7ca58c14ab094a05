package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Journaled bucket-directory rewrite — the durability layer under every
  * partial overwrite of a bucket-partitioned tree ([[CorpusStore]]'s
  * keyed upsert/delete, [[Compact]]'s defragmentation).
  *
  * Why it exists: Spark's dynamic partition overwrite commits each
  * touched directory as `delete(final)` then `rename(staging, final)` —
  * a non-atomic pair. A crash between them loses the bucket ENTIRELY
  * (neither the old files nor the new exist), and no replay can restore
  * rows that are gone from disk. So before the overwrite, the full
  * intended content of the touched buckets (plus the touched-bucket
  * list — an emptied bucket is absent from the data but its directory
  * must still be dropped) is journaled to a sibling `<tree>.journal`
  * dir; the overwrite runs only after the journal commits.
  *
  * Recovery contract: every entry point that reads or mutates the tree
  * calls [[recover]] first (one `fs.exists` when healthy). An
  * uncommitted journal (missing the engine-owned [[Commit]] sentinel)
  * means the overwrite never started — the tree is intact, drop the journal. A committed journal
  * means the overwrite may have torn anywhere — re-apply it (the
  * journal holds the complete post-state of every touched bucket, so
  * re-application is idempotent), then drop it. Appends must recover
  * BEFORE adding files: replaying a journal over a bucket that took an
  * append after the torn run would silently drop the appended rows.
  * (private[graft]: graft.operators.Similarity's IVF+PQ codes tree uses
  * the same recover discipline around its compaction.) */
private[graft] object BucketRewrite {

  private def journalDir(treeDir: String) = s"$treeDir.journal"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Per-tree JVM lock: recover mutates the tree and is called from
    * READ paths too, so two concurrent queries discovering the same
    * committed journal must not race the re-apply + journal delete
    * (concurrent dynamic overwrites of one directory are the exact
    * failure the journal exists to prevent, and the first finisher's
    * delete fails the second mid-read). [[journaledOverwrite]] holds the
    * SAME lock across journal-commit → apply → journal-delete (r17
    * verdict #3): without it, a serve-path `recover` in the same driver
    * that lists the writer's just-committed journal would re-apply it
    * CONCURRENTLY with the writer's own in-flight apply — the
    * serve-while-maintain shape the streaming specs model is in-JVM,
    * so the single-maintainer contract alone does not cover it. Within
    * one driver JVM the lock serializes them — the later entrant
    * re-checks and no-ops (journal gone). ACROSS processes the
    * single-maintainer contract still applies: exactly one application
    * (the streaming maintenance job) owns a tree's mutations, recovery
    * included. The lock map itself lives in [[Commit]] (shared with the
    * swap protocol — one locking story for every mutating recovery). */
  private def withTreeLock[A](treeDir: String)(body: => A): A =
    Commit.withTreeLock(treeDir)(body)

  /** Heal a torn rewrite if a committed journal exists; drop an
    * uncommitted one. Cheap no-op (one exists check) when healthy.
    * `manifestRoot`: when the tree lives under a [[Manifest]], a heal
    * is a destructive rewrite of the touched buckets and must refresh
    * the snapshot (see [[journaledOverwrite]]). */
  def recover(spark: SparkSession, treeDir: String, bucketCol: String,
      manifestRoot: Option[String] = None): Unit =
    withTreeLock(treeDir) {
      val j = journalDir(treeDir)
      val fs = fsOf(spark, j)
      val jPath = new org.apache.hadoop.fs.Path(j)
      if (fs.exists(jPath)) {
        // the journal's commit gate is the engine-owned sentinel at the
        // journal ROOT (see [[Commit]]); a journal written by the
        // pre-sentinel code committed via per-dir _SUCCESS on BOTH
        // content dirs, honored here as the legacy form — a committed
        // journal misread as uncommitted would be dropped, permanently
        // losing the very bucket it was written to protect (the r18
        // review's migration finding)
        val legacyCommitted =
          Commit.isCommitted(spark, s"$j/data") &&
            Commit.isCommitted(spark, s"$j/touched")
        if (fs.exists(new org.apache.hadoop.fs.Path(s"$j/${Commit.Marker}"))
            || legacyCommitted) {
          val touched = spark.read.parquet(s"$j/touched")
            .select(col("bucket").cast("long")).collect().map(_.getLong(0))
          applyOverwrite(spark, treeDir, bucketCol, touched.toIndexedSeq,
            spark.read.parquet(s"$j/data"))
          refreshManifest(spark, treeDir, bucketCol,
            touched.toIndexedSeq, manifestRoot)
        }
        fs.delete(jPath, true): Unit
      }
    }

  /** Journal then overwrite. `merged` must be PINNED (localCheckpoint)
    * by the caller and carry `bucketCol` as a long data column; it is
    * written to the journal verbatim, so the journal IS the post-state.
    * Holds the per-tree lock for the whole journal→apply→delete span
    * (see [[treeLocks]]); the JVM monitor is reentrant, so a caller
    * already holding it via its own recover is fine. */
  def journaledOverwrite(spark: SparkSession, treeDir: String,
      bucketCol: String, touched: Seq[Long], merged: DataFrame,
      manifestRoot: Option[String] = None): Unit =
    withTreeLock(treeDir) {
      import spark.implicits._
      val j = journalDir(treeDir)
      merged.write.mode("overwrite").parquet(s"$j/data")
      touched.toDF("bucket").coalesce(1)
        .write.mode("overwrite").parquet(s"$j/touched")
      // the sentinel flips the journal from droppable to authoritative
      // in one create — both content dirs are fully written before it
      Commit.mark(spark, j)
      applyOverwrite(spark, treeDir, bucketCol, touched, merged)
      refreshManifest(spark, treeDir, bucketCol, touched, manifestRoot)
      fsOf(spark, j).delete(new org.apache.hadoop.fs.Path(j), true): Unit
    }

  /** Post-overwrite [[Manifest]] delta for trees that carry one — the
    * journal-HEAL path on a manifest tree (a pre-migration journal, or
    * a spec-crafted one): the replayed overwrite destroyed and
    * recreated the touched buckets' files, so the snapshot must drop
    * the dead paths and adopt exactly the re-listed touched
    * directories. (Live maintenance on manifest trees never journals —
    * [[CorpusStore.rewriteKeyed]]'s additive snapshot flip replaced
    * the destructive overwrite there in r19.) */
  private def refreshManifest(spark: SparkSession, treeDir: String,
      bucketCol: String, touched: Seq[Long],
      manifestRoot: Option[String]): Unit =
    manifestRoot.filter(Manifest.exists(spark, _)).foreach { root =>
      val subtree = treeDir.stripPrefix(root).stripPrefix("/")
      val snap = Manifest.current(spark, root).get
      val touchedDirs = touched.map(b => s"$subtree/$bucketCol=$b/").toSet
      val dead = snap.under(subtree)
        .filter(f => touchedDirs.exists(f.startsWith))
      // precise add: only the touched directories are re-listed — the
      // overwrite replaced their contents wholesale, so the fresh
      // listing IS the new truth for exactly those directories
      val added = touched
        .flatMap(b => Manifest.listFiles(spark, root, s"$subtree/$bucketCol=$b"))
      Manifest.commitAdd(spark, root, added, dead): Unit
    }

  private def applyOverwrite(spark: SparkSession, treeDir: String,
      bucketCol: String, touched: Seq[Long], data: DataFrame): Unit = {
    data.repartition(col(bucketCol))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(bucketCol).parquet(treeDir)
    val present = data.select(col(bucketCol)).distinct()
      .collect().map(_.getLong(0)).toSet
    val fs = fsOf(spark, treeDir)
    touched.filterNot(present).foreach { b =>
      fs.delete(
        new org.apache.hadoop.fs.Path(s"$treeDir/$bucketCol=$b"), true): Unit
    }
  }

  /** For full-tree rebuild faces (writeSet/writeIndex/write): a fresh
    * build invalidates any stale journal wholesale. */
  def dropJournal(spark: SparkSession, treeDir: String): Unit = {
    val j = journalDir(treeDir)
    fsOf(spark, j).delete(new org.apache.hadoop.fs.Path(j), true): Unit
  }
}
