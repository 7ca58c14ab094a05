package graft.testbed

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev profiler: the crawl pipeline's kept-frame cost, per stage, with
  * shuffle/input volumes — written for the r16 sf10 decade work where
  * w4's wall-clock didn't respond to the keep-join tier and the per-stage
  * attribution was needed. Not part of the contract. */
object ProfileW4 {
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield (a - b) / 1000.0).getOrElse(-1.0)
        println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=$wall%7.1f s in=${m.inputMetrics.bytesRead / 1e6}%9.1f MB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%9.1f MB " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%9.1f MB  " +
          si.name.take(80))
      }
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    t("w3_funnel")(graft.SparkEntry.queries("w3_crawl_pipeline")(spark, dir).count())
    val w4 = graft.SparkEntry.queries("w4_crawl_kept")(spark, dir)
    t("w4_kept")(w4.count())
    println("W4 FINAL PLAN:\n" + w4.queryExecution.executedPlan.toString.take(8000))

    // THE decade-table measurement (r16 verdict: the battery wrapper's
    // kept.cache() materialized ~1 GB of payload rows to memory+disk and
    // dominated the sf10 headline — 89.1 s wrapper vs ~26 s operator).
    // Pin METADATA instead: a fresh pipeline run reduced to
    // (kept count, xor of id hashes) in ONE job — result identity is
    // still pinned (the xor changes if any id changes; bit_xor, not sum:
    // full-range xxhash64 values overflow a long sum under ANSI), but no
    // payload row is ever cached or collected. This number states the
    // operator's growth law; SCALE.md's w4 decade row records it.
    val fresh = graft.testbed.DocQueries.crawlRun(spark, dir)
    val meta = t("w4_meta_pin") {
      fresh.kept.agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.expr("bit_xor(xxhash64(id))"))
        .collect()(0)
    }
    println(s"W4 META kept_count=${meta.getLong(0)} id_hash_xor=${meta.getLong(1)}")
    spark.stop()
  }
}
