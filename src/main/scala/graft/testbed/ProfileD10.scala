package graft.testbed

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: d10 LSH stage costs + occupancy skew. Not a contract. */
object ProfileD10 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10d")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val n = t("count")(emb.count())
    val planes = graft.operators.Dedup.autoPlanes(n)
    println(s"PROF n=$n planes=$planes")
    val tb = emb.repartition(64)
      .select(col("vec_id").as("id"),
        explode(graft.operators.Similarity.lshBuckets("embedding", 64, 8, planes)).as("b"))
      .select(col("id"), col("b.t").as("t"), col("b.bucket").as("bucket"))
    val occ = t("occupancy agg")(
      tb.groupBy("t", "bucket").count()
        .agg(count(lit(1)).as("cells"), sum("count").as("rows"),
          sum(col("count") * (col("count") - 1) / 2).as("cand_pairs"),
          max("count").as("max_occ"),
          expr("percentile_approx(count, 0.99)").as("p99_occ"))
        .collect()(0))
    println(s"PROF occ: $occ")
    val full = t("full d10")(
      graft.operators.Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        minCosine = 0.4, dims = 64, tables = 8).count())
    println(s"PROF pairs=$full")
    spark.stop()
  }
}
