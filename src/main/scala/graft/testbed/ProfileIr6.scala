package graft.testbed

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: the persisted URL seen set's three faces (write /
  * append / probe) timed separately over the ir6 URL universe — written
  * for the r17 decade table (sf1 vs sf10: does each face's cost track
  * its own input, with the probe delta-proportional?). Pins METADATA
  * (novel count + bit_xor of url hashes — the ProfileW4 discipline), so
  * the number states the operator, not a payload cache. Not part of the
  * contract. */
object ProfileIr6 {
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
    val u = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"),
      concat(lit("http://h"), (col("doc_id") % 13).cast("string"),
        lit(".example/p/"), col("doc_id").cast("string")).as("url"))
    val ix = java.nio.file.Files.createTempDirectory("graft-ir6-prof").toString
    // buckets sized for the decade: ~64 at sf1 keeps directories small
    t("seen_write_0_2")(graft.io.SeenSet.writeSet(
      u.filter(col("doc_id") % 10 < 3), "url", ix))
    t("seen_append_3_5")(graft.io.SeenSet.appendToSet(
      u.filter(col("doc_id") % 10 >= 3 && col("doc_id") % 10 < 6), "url", ix))
    val novel = t("seen_probe_4_9")(
      graft.io.SeenSet.probeNovel(spark, ix,
          u.filter(col("doc_id") % 10 >= 4), "url")
        .agg(count(lit(1)), expr("bit_xor(xxhash64(url))")).collect()(0))
    println(s"IR6 META novel_count=${novel.getLong(0)} url_hash_xor=${novel.getLong(1)}")
    // a DELTA-sized probe (0.1% of the corpus): the cost a steady-state
    // discovery batch actually pays against the same standing set
    val delta = t("seen_probe_delta")(
      graft.io.SeenSet.probeNovel(spark, ix,
          u.filter(col("doc_id") % 1000 === 7), "url")
        .agg(count(lit(1)), expr("bit_xor(xxhash64(url))")).collect()(0))
    println(s"IR6 DELTA novel_count=${delta.getLong(0)} url_hash_xor=${delta.getLong(1)}")
    spark.stop()
  }
}
