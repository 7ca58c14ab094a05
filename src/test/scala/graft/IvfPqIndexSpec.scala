package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[Similarity.ivfPqIndexWrite]] / [[Similarity.ivfPqIndexTopK]]: the
  * persisted IVF+PQ index — the m-bytes-per-vector serving artifact — must
  * return exactly what the in-flight [[Similarity.ivfPqTopK]] computes, and
  * the codes scan must be partition-pruned to the probed cells (the
  * IvfIndexSpec contract, applied to the compressed index).
  */
class IvfPqIndexSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("index serve equals in-flight IVF+PQ and prunes to the probed cells") {
    val dir = Files.createTempDirectory("graft-ivfpq").toFile.getAbsolutePath
    Similarity.ivfPqIndexWrite(emb, "vec_id", "embedding", dir,
      dims = 64, nCentroids = 16, m = 4, codes = 16, iters = 2)
    val queries = emb.filter(col("vec_id") < 5)

    val fromIndex = Similarity.ivfPqIndexTopK(spark, dir, queries,
      "vec_id", "embedding", k = 3, nProbe = 4)
    val inFlight = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 3, dims = 64, nCentroids = 16, nProbe = 4, m = 4, codes = 16, iters = 2)
    assert(rowSet(fromIndex) === rowSet(inFlight),
      "the persisted IVF+PQ index must reproduce the in-flight result exactly")
    assert(fromIndex.count() > 0, "serving returned no rows")

    // layout: one directory per coarse cell, codes only (m ints/vector)
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("cent_id=")).map(_.getName).sorted
    assert(cellDirs.nonEmpty && cellDirs.length <= 16)

    // pruning: the codes scan's selected partitions are exactly the probed
    // cells — fewer than the cells on disk (5 queries x 4 probes over 16
    // cells cannot cover all cells the corpus populated here)
    fromIndex.count()
    def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => allScans(a.executedPlan) }.flatten ++
        p.collect {
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(s.plan)
        }.flatten
    val scans = allScans(fromIndex.queryExecution.executedPlan)
    val codesScan = scans.find(_.metadata.get("Location").exists(_.contains("codes")))
      .getOrElse(fail(s"no codes file scan in plan: $scans"))
    assert(codesScan.metadata("PartitionFilters").contains("cent_id"),
      s"scan carries no cent_id partition filter: ${codesScan.metadata("PartitionFilters")}")
    val selected = codesScan.selectedPartitions.partitionCount
    assert(selected > 0 && selected < cellDirs.length,
      s"probe read $selected of ${cellDirs.length} cells — not pruned")
  }

  test("serving resolves parameters from the layout, not the caller") {
    // a non-default geometry: the meta sidecar must carry it to the probe
    val dir = Files.createTempDirectory("graft-ivfpq-m8").toFile.getAbsolutePath
    Similarity.ivfPqIndexWrite(emb, "vec_id", "embedding", dir,
      dims = 64, nCentroids = 8, m = 8, codes = 8, iters = 1)
    val queries = emb.filter(col("vec_id") < 3)
    val fromIndex = Similarity.ivfPqIndexTopK(spark, dir, queries,
      "vec_id", "embedding", k = 3, nProbe = 2)
    val inFlight = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 3, dims = 64, nCentroids = 8, nProbe = 2, m = 8, codes = 8, iters = 1)
    assert(rowSet(fromIndex) === rowSet(inFlight))
  }
}
