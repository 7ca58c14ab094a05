package graft.testbed

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: the text index's faces at the decades under the r17
  * batch-scoped layout — the redesign's claim is that a FIXED-size
  * streaming batch costs the same against a 10× larger standing index
  * (the batch writes only its own ingest_batch directories; the first
  * design read+rewrote every touched bucket, ~the whole tree). Serve
  * cost is |terms| bucket reads either way. Not part of the contract. */
object ProfileTextIndex {
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
    val ix = java.nio.file.Files.createTempDirectory("graft-ti-prof").toString
    t("ti_write_90pct")(graft.io.TextIndex.writeIndex(
      docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", ix))
    // the steady-state streaming batch: FIXED 500 docs against the
    // standing index — the number that must stay flat across decades
    val batch = docs.filter(col("doc_id") % 10 === 7).limit(500)
      .localCheckpoint()
    t("ti_append_batch_500docs")(graft.io.TextIndex.appendBatch(
      batch, "doc_id", "text", ix, batchId = 0L))
    val hits = t("ti_bm25_serve")(
      graft.io.TextIndex.bm25SearchIndex(spark, ix,
        Seq("the", "and", "table"), k = 10).collect())
    println(s"TI META top=${hits.take(2).mkString("; ")}")
    val cmp = t("ti_compact")(graft.io.TextIndex.compact(spark, ix))
    println(s"TI COMPACT $cmp")
    spark.stop()
  }
}
