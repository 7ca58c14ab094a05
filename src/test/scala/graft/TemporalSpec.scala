package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

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

  test("incremental partials: merge of arbitrary deltas equals full aggregate") {
    val in = df(
      "timestamp LONG, feature STRING, value DOUBLE", Seq(
        Row(ts("2020-01-05"), "F", 1.0),
        Row(ts("2020-01-20"), "F", 3.0),
        Row(ts("2020-02-01"), "F", 5.0),
        Row(ts("2020-01-07"), "G", 7.0)))
    val full = Temporal.aggregate(in, "month")
      .select("timestamp", "feature", "t_sum", "t_mean")
    // split on row parity of value — any partition of the rows must merge
    // back to the full result; a three-way merge exercises the reduce
    val parts = Seq(
      in.filter(col("value") <= 1.0),
      in.filter(col("value") > 1.0 && col("value") < 7.0),
      in.filter(col("value") >= 7.0)).map(Temporal.aggregatePartial(_, "month"))
    val merged = Temporal.finalizePartial(Temporal.mergePartials(parts))
      .select("timestamp", "feature", "t_sum", "t_mean")
    assert(rowSet(merged) === rowSet(full))
    // the partial's count column is the group cardinality
    val counts = Temporal.mergePartials(parts)
      .select("timestamp", "feature", "t_count")
    assert(rowSet(counts) === Set(
      Seq(ts("2020-01-01"), "F", 2L), Seq(ts("2020-02-01"), "F", 1L),
      Seq(ts("2020-01-01"), "G", 1L)))
  }
}
