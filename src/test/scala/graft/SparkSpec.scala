package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the golden-semantics suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** epoch-ms for a YYYY-MM-DD UTC date (tests/utils.py ts helper). */
  def ts(date: String): Long =
    java.time.LocalDate.parse(date).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli

  def df(schemaDDL: String, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType.fromDDL(schemaDDL))

  /** Rows as (sorted) plain seqs for order-insensitive golden compare. */
  def rowSet(d: DataFrame): Set[Seq[Any]] =
    d.collect().map(_.toSeq).toSet
}

object SparkSpec {
  // SELF-HEALING accessor (r20 verdict #1): one driver run died mid-suite
  // with "Job cancelled because SparkContext was shut down" — an async
  // context teardown (RejectedExecutionException in TaskSchedulerImpl →
  // DAGScheduler stops the context in a new thread) that a plain
  // `lazy val` then serves, stopped, to every remaining suite. Rebuild
  // when the held context is stopped so at most the suite the teardown
  // landed in is affected, never the rest of the run.
  private var s: SparkSession = null
  def session: SparkSession = synchronized {
    if (s == null || s.sparkContext.isStopped) s = build()
    s
  }
  private def build(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(s)
    s
  }
}
