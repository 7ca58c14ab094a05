package graft.testbed

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: pageRank internals staged. Not part of the contract. */
object ProfileG1b {
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
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val o = Datacube.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Datacube.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
    val edges = pairs.select(col("c").as("src"), col("sp").as("dst"))
      .unionAll(pairs.select(col("sp").as("src"), col("c").as("dst")))
    t("warm edges")(edges.count())
    for (round <- 1 to 2) {
      val e0 = edges.select(col("src").cast("long"), col("dst").cast("long")).distinct()
      val ePre = e0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = t(s"r$round distinct+persist+deg")(
        ePre.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint())
      val n = t(s"r$round deg count")(deg.count())
      val degMap = t(s"r$round degMap collect")(deg.as[(Long, Long)].collect().toMap)
      var ranks: Array[(Long, Double)] =
        degMap.keysIterator.map(k => k -> 1.0 / n.toDouble).toArray
      for (i <- 0 until 5) {
        t(s"r$round iter $i") {
          val contribArr: Array[(Long, Long)] = ranks.flatMap { case (node, r) =>
            degMap.get(node).map { outdeg =>
              (node, math.round(r / outdeg * 1e12))
            }
          }
          val contrib = spark.createDataset(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(contribArr))
            .toDF("cnode", "q12")
          ranks = ePre.alias("ed")
            .join(broadcast(contrib), col("ed.src") === col("cnode"))
            .groupBy("dst").agg(sum("q12").as("s12"))
            .select(col("dst").as("node"),
              (lit(0.15 / n) + lit(0.85) * (col("s12") / 1e12)).as("rank"))
            .as[(Long, Double)].collect()
        }
      }
      ePre.unpersist()
    }
    spark.stop()
  }
}
