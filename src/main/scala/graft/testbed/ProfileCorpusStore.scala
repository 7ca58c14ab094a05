package graft.testbed

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: the corpus store's delta-proportionality claim at the
  * decades — build cost tracks the CORPUS, but a fixed-size change batch
  * must cost roughly the same against a 10× larger store (touched
  * buckets × bucket size, and bucket size grows 10× while touched-bucket
  * count saturates — the honest statement is the ratio BETWEEN the
  * fixed-delta rows). Metadata pins only. Not part of the contract. */
object ProfileCorpusStore {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = args.lift(1).map(_.toInt).getOrElse(256)
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
      .select("doc_id", "text")
    val ix = java.nio.file.Files.createTempDirectory("graft-cstore-prof").toString
    t("store_write_full")(graft.io.CorpusStore.write(docs, "doc_id", ix, buckets))
    // corpus-proportional delta: 10% of keys rewritten
    t("store_upsert_10pct")(graft.io.CorpusStore.upsert(
      docs.filter(col("doc_id") % 10 === 1)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text")),
      "doc_id", ix))
    // FIXED-size delta: 500 keys, the steady-state CDC batch — this is
    // the number that must stay near-flat across the decades
    t("store_upsert_500keys")(graft.io.CorpusStore.upsert(
      docs.filter(col("doc_id") % 1000 === 3).limit(500)
        .select(col("doc_id"), concat(col("text"), lit(" v3")).as("text")),
      "doc_id", ix))
    t("store_delete_500keys")(graft.io.CorpusStore.delete(
      docs.filter(col("doc_id") % 1000 === 7).limit(500).select("doc_id"),
      "doc_id", ix))
    val meta = graft.io.CorpusStore.read(spark, ix)
      .agg(count(lit(1)), expr("bit_xor(xxhash64(doc_id, text))")).collect()(0)
    println(s"STORE META rows=${meta.getLong(0)} content_xor=${meta.getLong(1)}")
    spark.stop()
  }
}
