package graft.testbed

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: the persisted MinHash band index's faces (write /
  * append / probe) timed separately at the steady-state split (standing
  * reference = 90% of the corpus, batch = the 10% sliver) — written for
  * the r17 decade table after probe gained the duplicate-collapse heal
  * (#14): the heal must not change the probe's growth law. Metadata
  * pins only (pair count + xor). Not part of the contract. */
object ProfileBandIndex {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ix = java.nio.file.Files.createTempDirectory("graft-band-prof").toString
    t("band_write_80pct")(graft.io.BandIndex.writeIndex(
      docs.filter(col("doc_id") % 10 < 8), "doc_id", "text", ix))
    t("band_append_10pct")(graft.io.BandIndex.appendToIndex(
      docs.filter(col("doc_id") % 10 === 8), "doc_id", "text", ix))
    val pairs = t("band_probe_10pct")(
      graft.io.BandIndex.probe(spark, ix,
          docs.filter(col("doc_id") % 10 === 9), "doc_id", "text")
        .agg(count(lit(1)),
          expr("bit_xor(xxhash64(doc_id, ref_id, shared_bands))")).collect()(0))
    println(s"BAND META pair_count=${pairs.getLong(0)} pair_xor=${pairs.getLong(1)}")
    spark.stop()
  }
}
