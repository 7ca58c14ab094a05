package graft.testbed

import org.apache.spark.sql.SparkSession

/** Dev tool: the [[graft.io.Manifest]] metadata plane at 100 TB file
  * counts. A family tree at that scale holds ~10^4–10^5 live files
  * (buckets sized at ~512 MB, compaction bounding per-bucket fan-in),
  * so the questions are: what does a snapshot RESOLVE cost cold (one
  * listStatus + one text-file read) and warm (cache hit), what does a
  * maintenance COMMIT cost (read-modify-write of the list), and what
  * does a version file weigh on disk. Synthetic paths, real
  * filesystem, no Spark jobs — the manifest plane never touches
  * executors by design. Prints one JSON line per file count. */
object ManifestScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq(10000, 100000, 1000000)) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-manscale-$n").toString
      val files = (0 until n).map(i =>
        f"rows/__graft_bucket=${i % 4096}/part-$i%08d-0000.snappy.parquet")
      var t0 = System.nanoTime()
      graft.io.Manifest.commitSet(spark, root, files, Nil)
      val commitMs = (System.nanoTime() - t0) / 1e6
      // cold resolve: fresh text-file read (cache invalidated by a
      // fake newer... simplest: measure the first resolve in a fresh
      // JVM-state by clearing via a second commit then resolving)
      t0 = System.nanoTime()
      val snap = graft.io.Manifest.current(spark, root).get
      val warmMs = (System.nanoTime() - t0) / 1e6
      // a delta commit at maintenance shape: drop one bucket's files,
      // add one replacement
      val bucketFiles = snap.under("rows")
        .filter(_.contains("__graft_bucket=7/"))
      t0 = System.nanoTime()
      graft.io.Manifest.commitAdd(spark, root,
        Seq("rows/__graft_bucket=7/part-compacted-0000.snappy.parquet"),
        bucketFiles)
      val deltaMs = (System.nanoTime() - t0) / 1e6
      // cold = the uncached path (Manifest.at reads the version file
      // every time — what a fresh process pays once per version)
      t0 = System.nanoTime()
      val resolved = graft.io.Manifest.at(spark, root, 2L).get
      val coldMs = (System.nanoTime() - t0) / 1e6
      val bytes = Option(new java.io.File(s"$root/manifest").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(_.getName.startsWith("v")).map(_.length).max
      println(f"""{"files":$n,"commit_ms":$commitMs%.1f,"delta_commit_ms":$deltaMs%.1f,"resolve_cold_ms":$coldMs%.1f,"resolve_warm_ms":$warmMs%.1f,"version_bytes":$bytes,"live":${resolved.files.size}}""")
    }
    spark.stop()
  }
}
