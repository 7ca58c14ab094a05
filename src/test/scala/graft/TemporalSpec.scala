package graft

import org.apache.spark.sql.Row

import graft.operators.Temporal

/** Golden semantics of A1 temporal aggregation
  * (reference: tests/unit/test_temporal_aggregation.py:18-117). */
class TemporalSpec extends SparkSpec {

  private val schema =
    "timestamp LONG, country STRING, lat DOUBLE, lng DOUBLE, feature STRING, value DOUBLE, qual1 STRING"

  private def monthlyInput = df(schema, Seq(
    Row(ts("2022-01-01"), "A", 1.1, 1.0, "Feature1", 1.0, "a"),
    Row(ts("2022-01-15"), "A", 1.1, 1.0, "Feature1", 3.0, "a"),
    Row(ts("2022-02-02"), "A", 1.1, 1.0, "Feature1", 1.1, "a"),
    Row(ts("2022-01-01"), "B", 2.1, 2.0, "Feature1", 4.0, "a"),
    Row(ts("2022-01-15"), "B", 2.1, 2.0, "Feature1", 6.0, "a"),
    Row(ts("2022-02-02"), "B", 2.1, 2.0, "Feature1", 2.0, "a"),
    Row(ts("2022-01-01"), "A", 1.1, 1.0, "Feature2", 1.0, "a"),
    Row(ts("2022-01-15"), "A", 1.1, 1.0, "Feature2", 1.0, "a"),
    Row(ts("2022-02-02"), "A", 1.1, 1.0, "Feature2", 1.2, "a"),
    Row(ts("2022-01-01"), "B", 2.1, 2.0, "Feature2", 3.0, "a"),
    Row(ts("2022-01-15"), "B", 2.1, 2.0, "Feature2", 3.0, "a"),
    Row(ts("2022-02-02"), "B", 2.1, 2.0, "Feature2", 4.2, "a")))

  test("monthly bucketing to UTC month start with t_sum/t_mean") {
    val out = Temporal.aggregate(monthlyInput, "month")
      .select("timestamp", "country", "feature", "t_sum", "t_mean")
    assert(rowSet(out) === Set(
      Seq(ts("2022-01-01"), "A", "Feature1", 4.0, 2.0),
      Seq(ts("2022-02-01"), "A", "Feature1", 1.1, 1.1),
      Seq(ts("2022-01-01"), "B", "Feature1", 10.0, 5.0),
      Seq(ts("2022-02-01"), "B", "Feature1", 2.0, 2.0),
      Seq(ts("2022-01-01"), "A", "Feature2", 2.0, 1.0),
      Seq(ts("2022-02-01"), "A", "Feature2", 1.2, 1.2),
      Seq(ts("2022-01-01"), "B", "Feature2", 6.0, 3.0),
      Seq(ts("2022-02-01"), "B", "Feature2", 4.2, 4.2)))
  }

  private def yearlyInput = df(schema, Seq(
    Row(ts("2022-01-01"), "A", 1.1, 1.0, "Feature1", 1.0, "a"),
    Row(ts("2022-01-15"), "A", 1.1, 1.0, "Feature1", 3.0, "a"),
    Row(ts("2022-02-02"), "A", 1.1, 1.0, "Feature1", 2.3, "a"),
    Row(ts("2022-01-01"), "B", 2.1, 2.0, "Feature1", 4.0, "a"),
    Row(ts("2022-01-15"), "B", 2.1, 2.0, "Feature1", 6.0, "a"),
    Row(ts("2022-02-02"), "B", 2.1, 2.0, "Feature1", 2.0, "a"),
    Row(ts("2022-01-01"), "A", 1.1, 1.0, "Feature1", 1.1, "b"),
    Row(ts("2022-01-15"), "A", 1.1, 1.0, "Feature1", 1.0, "b"),
    Row(ts("2022-02-02"), "A", 1.1, 1.0, "Feature1", 1.2, "b"),
    Row(ts("2022-01-01"), "B", 2.1, 2.0, "Feature1", 3.0, "b"),
    Row(ts("2022-01-15"), "B", 2.1, 2.0, "Feature1", 3.0, "b"),
    Row(ts("2022-02-02"), "B", 2.1, 2.0, "Feature1", 4.2, "b")))

  test("yearly bucketing") {
    // rounded: double sums are order-dependent across partitions
    val out = Temporal.aggregate(yearlyInput, "year")
      .selectExpr("timestamp", "country", "qual1", "round(t_sum, 6)", "round(t_mean, 6)")
    assert(rowSet(out) === Set(
      Seq(ts("2022-01-01"), "A", "a", 6.3, 2.1),
      Seq(ts("2022-01-01"), "B", "a", 12.0, 4.0),
      Seq(ts("2022-01-01"), "A", "b", 3.3, 1.1),
      Seq(ts("2022-01-01"), "B", "b", 10.2, 3.4)))
  }

  test("'all' resolution maps every timestamp to 0") {
    val out = Temporal.aggregate(yearlyInput, "all")
      .selectExpr("timestamp", "country", "qual1", "round(t_sum, 6) AS t_sum")
    assert(out.collect().forall(_.getLong(0) == 0L))
    assert(rowSet(out.select("country", "qual1", "t_sum")) === Set(
      Seq("A", "a", 6.3), Seq("B", "a", 12.0), Seq("A", "b", 3.3), Seq("B", "b", 10.2)))
  }

  test("weighted aggregation adds t_wavg = sum(v*w)/sum(w) and mean weight") {
    val in = df(
      "timestamp LONG, feature STRING, value DOUBLE, w DOUBLE", Seq(
        Row(0L, "F", 10.0, 1.0),
        Row(1L, "F", 20.0, 3.0)))
    val out = Temporal.aggregate(in, "all", "w")
      .select("feature", "t_sum", "t_mean", "t_wavg", "w")
    assert(rowSet(out) === Set(Seq("F", 30.0, 15.0, (10.0 * 1 + 20.0 * 3) / 4.0, 2.0)))
  }
}
