package graft.testbed

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: g1's stages timed individually. Not part of the contract. */
object ProfileG1 {
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
    val o = t("read orders")(Datacube.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey")).cache())
    val l = t("read lineitem")(Datacube.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")))
    t("count orders")(o.count())
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
    val edges = pairs.select(col("c").as("src"), col("sp").as("dst"))
      .unionAll(pairs.select(col("sp").as("src"), col("c").as("dst")))
    t("edges count")(edges.count())
    val ranked = t("pageRank total")(
      graft.operators.Graph.pageRank(edges, "src", "dst", iters = 5))
    t("materialize output")(ranked.count())
    // second run: warm JVM
    val ranked2 = t("pageRank total (warm)")(
      graft.operators.Graph.pageRank(edges, "src", "dst", iters = 5))
    t("materialize output (warm)")(ranked2.count())
    spark.stop()
  }
}
