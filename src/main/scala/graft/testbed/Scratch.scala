package graft.testbed

import org.apache.spark.sql.SparkSession

/** Dev scratch: A/B session-config experiments on a subset of battery
  * entries, in one JVM per config, with a warm rep to split JIT from
  * steady state. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("base")
    val names = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
      "o1_topk_window", "t1_text_stats", "t2_lang_id", "t12_repetition",
      "t16_compress_ratio", "t28_domain_filter", "t43_url_canonicalize",
      "t48_html_extract", "d1_exact_dedup", "v1_cosine_topk"))
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val b2 = mode match {
      case "minpart" => b.config("spark.sql.files.minPartitionNum", 1)
      case "coalesce" =>
        b.config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      case "both" =>
        b.config("spark.sql.files.minPartitionNum", 1)
          .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      case _ => b
    }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    println("SCRATCH docs scan partitions: " +
      spark.read.parquet(s"$sfDir/documents.parquet").rdd.getNumPartitions +
      " lineitem: " +
      spark.read.parquet(s"$sfDir/lineitem.parquet").rdd.getNumPartitions)
    for (r <- 1 to reps) {
      var tot = 0.0
      for (name <- names) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        tot += dt
        if (r == reps) println(f"SCRATCH $mode $name rep$r $dt%7.2f s rows=$n")
      }
      println(f"SCRATCH $mode TOTAL rep$r $tot%7.2f s")
    }
  }
}
