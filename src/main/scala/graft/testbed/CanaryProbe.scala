package graft.testbed

import org.apache.spark.sql.SparkSession

/** Dev tool: Bench's CPU contention canary alone — ~30 s of warmup +
  * min-of-3 probe, printing ns/row. Use it to pick a quiet window for
  * an official artifact recording without paying a battery to find out
  * the window was bad (the r17 lesson: four sf1 recordings rode a
  * degraded host; a userspace CPU probe read clean while this in-JVM
  * probe correctly read ~2×). Quiet norm on this machine: 0.45-0.57.
  * Not part of the contract. */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, cpus)
        .selectExpr("sum((id * 2654435761) % 1000000007) as s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    var warmRuns = 1; var agree = 0; var warmPrev = once()
    while (agree < 2 && warmRuns < 14) {
      val warmCur = once(); warmRuns += 1
      if (math.abs(warmCur - warmPrev) / math.min(warmCur, warmPrev) <= 0.10)
        agree += 1
      else agree = 0
      warmPrev = warmCur
    }
    val best = Seq.fill(3)(once()).min
    println(f"CANARY ns_per_row=${best / 2e8 * 1e9}%.3f warm_runs=$warmRuns")
    spark.stop()
  }
}
