package graft.testbed

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: the persisted IVF+PQ index's serve path (ir4) and the
  * r18 maintenance faces, timed separately for the decade table the r17
  * verdict asked for (build-once vs probe-fixed-batch growth at
  * sf1→sf10): one corpus-sized build, then a FIXED 20-query serve at
  * nProbe=4 — the scan reads nProbe/nCentroids of an m-bytes-per-vector
  * artifact, so its growth should track cell size (linear in corpus but
  * 512×-shrunk), not corpus passes — plus the drift gauge on a FIXED
  * 2k-vector sliver (sliver-sized work, should be flat across decades).
  * Metadata pins only (the ProfileW4 discipline: row count + xor, so
  * the number states the operator, not a payload cache). Not part of
  * the contract. */
object ProfileIvfPqIndex {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val ix = java.nio.file.Files.createTempDirectory("graft-ivfpq-prof").toString
    t("ivfpq_write_full")(graft.operators.Similarity.ivfPqIndexWrite(
      emb, "vec_id", "embedding", ix,
      dims = 64, nCentroids = 16, m = 4, codes = 16, iters = 2))
    val queries = emb.filter(col("vec_id") < 20)
    val served = t("ivfpq_serve_20q")(
      graft.operators.Similarity.ivfPqIndexTopK(spark, ix, queries,
          "vec_id", "embedding", k = 3, nProbe = 4)
        .agg(count(lit(1)),
          expr("bit_xor(xxhash64(query_id, rank, neighbor_id))")).collect()(0))
    println(s"IR4 META row_count=${served.getLong(0)} xor=${served.getLong(1)}")
    // fixed-size sliver: the gauge's cost contract is sliver×queries,
    // corpus-size-free — the decade table's flat row
    val sliver = emb.filter(col("vec_id") % 97 === 0).limit(2000)
    val gauge = t("ivfpq_drift_gauge_sliver")(
      graft.operators.Similarity.ivfPqIndexDriftGauge(spark, ix, sliver,
          queries, "vec_id", "embedding", k = 3, nProbe = 4)
        .agg(count(lit(1)), round(avg(col("recall")), 4)).collect()(0))
    println(s"IR8 META n_queries=${gauge.getLong(0)} mean_recall=${gauge.getDouble(1)}")
    spark.stop()
  }
}
