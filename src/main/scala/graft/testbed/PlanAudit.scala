package graft.testbed

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed formatted plan of named battery entries
  * (run each to let AQE finalize, then dump). Not part of the contract. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("t54_stupid_backoff"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.count() // finalize AQE
      println(s"===== PLAN $n =====")
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
