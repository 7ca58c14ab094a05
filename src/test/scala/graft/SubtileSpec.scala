package graft

import org.apache.spark.sql.Row

import graft.pipeline.Pipeline

/** Golden semantics of A8 subtile aggregation
  * (reference: tests/unit/test_subtile_aggregation.py:19-52 — same input
  * lat/lng rows, same expected zoom-14 subtiles and sums). */
class SubtileSpec extends SparkSpec {

  test("zoom-14 subtile aggregation golden values") {
    val in = df(
      "timestamp LONG, country STRING, lat DOUBLE, lng DOUBLE, feature STRING, " +
        "t_sum DOUBLE, t_mean DOUBLE", Seq(
        Row(0L, "Ethiopia", 10.168, 40.646, "feature1", 4.0, 2.0),
        Row(0L, "Ethiopia", 10.167, 40.645, "feature1", 12.0, 6.0),
        Row(0L, "Ethiopia", 10.166, 40.644, "feature1", 80.0, 40.0),
        Row(0L, "South Sudan", 9.55, 31.65, "feature1", 60.0, 30.0),
        Row(0L, "South Sudan", 9.555, 31.655, "feature1", 60.0, 30.0),
        Row(1L, "Ethiopia", 10.168, 40.646, "feature1", 6.0, 3.0),
        Row(1L, "Ethiopia", 10.167, 40.645, "feature1", 14.0, 7.0),
        Row(1L, "Ethiopia", 10.166, 40.644, "feature1", 60.0, 30.0),
        Row(1L, "South Sudan", 9.55, 31.65, "feature1", 80.0, 0.8),
        Row(1L, "South Sudan", 9.555, 31.655, "feature1", 10.0, 1.0),
        Row(1L, "South Sudan", 9.55, 31.65, "feature2", 180.0, 1.8)))

    val out = Pipeline.subtileAgg(in)
      .selectExpr("feature", "timestamp", "z", "x", "y",
        "round(s_sum_t_sum, 6)", "round(s_sum_t_mean, 6)", "s_count")
    assert(rowSet(out) === Set(
      Seq("feature1", 0L, 14, 10041, 7726, 96.0, 48.0, 3L),
      Seq("feature1", 0L, 14, 9632, 7755, 120.0, 60.0, 2L),
      Seq("feature1", 1L, 14, 10041, 7726, 80.0, 40.0, 3L),
      Seq("feature1", 1L, 14, 9632, 7755, 90.0, 1.8, 2L),
      Seq("feature2", 1L, 14, 9632, 7755, 180.0, 1.8, 1L)))
  }
}
