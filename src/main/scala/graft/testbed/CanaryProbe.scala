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
    val warmRuns = CpuCanary.warm(spark, cpus)
    val best = CpuCanary.probe(spark, cpus)
    println(f"CANARY ns_per_row=${CpuCanary.nsPerRow(best)}%.3f warm_runs=$warmRuns")
    spark.stop()
  }
}
