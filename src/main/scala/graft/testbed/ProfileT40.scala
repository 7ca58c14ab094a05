package graft.testbed

import org.apache.spark.sql.SparkSession

/** Dev profiler: t40 run repeatedly in one session. Not part of the contract. */
object ProfileT40 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
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
    for (i <- 1 to 3) {
      t(s"t40 run $i") {
        graft.SparkEntry.queries("t40_doc_pipeline")(spark, dir).count()
      }
      DocQueries.clearCaches(spark)
      System.gc()
    }
    spark.stop()
  }
}
