package graft

import graft.operators.Qualifiers
import graft.pipeline.{OutputTask, Pipeline, PipelineConfig}

/** Golden semantics of the configure_pipeline skip matrix and qualifier
  * thresholds (reference: tests/unit/test_configure_pipeline.py:24-108,
  * tests/unit/test_apply_qualifier_thresholds.py:5-25). */
class PipelineConfigSpec extends SparkSpec {

  private val geoCols = Seq("timestamp", "country", "admin1", "admin2", "admin3",
    "lat", "lng", "feature", "value", "qual1", "qual2")
  private def cfg(isIndicator: Boolean, selected: Seq[String] = Seq.empty) =
    PipelineConfig("m", "r", Seq("p"), isIndicator = isIndicator,
      selectedOutputTasks = selected,
      modelBucket = "model_bucket", indicatorBucket = "indicator_bucket")

  test("model run: model bucket, all tasks, summary on") {
    val d = Pipeline.configurePipeline(geoCols, cfg(isIndicator = false))
    assert(d.bucket === "model_bucket")
    assert(d.computeMonthly && d.computeAnnual && d.computeSummary)
    assert(d.skipped === Map(
      OutputTask.GlobalTimeseries -> false,
      OutputTask.RegionalStats -> false,
      OutputTask.RegionalTimeseries -> false,
      OutputTask.RegionalAggregation -> false,
      OutputTask.ComputeTiles -> false,
      OutputTask.RecordResults -> false))
  }

  test("indicator run: indicator bucket, no summary") {
    val d = Pipeline.configurePipeline(geoCols, cfg(isIndicator = true))
    assert(d.bucket === "indicator_bucket")
    assert(d.computeMonthly && d.computeAnnual && !d.computeSummary)
  }

  test("missing lat/lng forces compute_tiles skip") {
    val noGeo = geoCols.filterNot(Seq("lat", "lng").contains)
    val d = Pipeline.configurePipeline(noGeo, cfg(isIndicator = true))
    assert(d.skipped(OutputTask.ComputeTiles) === true)
    assert(d.skipped(OutputTask.GlobalTimeseries) === false)
    assert(d.skipped(OutputTask.RecordResults) === false)
  }

  test("selected task subset skips the rest and record_results") {
    val d = Pipeline.configurePipeline(geoCols, cfg(isIndicator = true,
      selected = Seq(OutputTask.GlobalTimeseries, OutputTask.RegionalAggregation, "invalid_task")))
    assert(d.skipped === Map(
      OutputTask.GlobalTimeseries -> false,
      OutputTask.RegionalStats -> true,
      OutputTask.RegionalTimeseries -> true,
      OutputTask.RegionalAggregation -> false,
      OutputTask.ComputeTiles -> true,
      OutputTask.RecordResults -> true))
  }

  test("qualifier count limit prunes big qualifiers and unknown features") {
    val qMap = Map(
      "f1" -> Seq("qual1", "qual2", "qual3"),
      "f2" -> Seq("qual1"),
      "f3" -> Seq("qual1"),
      "f_invalid" -> Seq("qual1"))
    val counts = Map(
      "f1" -> Map("qual1" -> 10L, "qual2" -> 8L, "qual3" -> 10L),
      "f2" -> Map("qual1" -> 15L, "qual2" -> 10L),
      "f3" -> Map("qual1" -> 5L, "qual2" -> 10L))
    val (newMap, newCols) = Qualifiers.applyQualifierCountLimit(
      qMap, Seq("qual1", "qual2", "qual3"), counts, maxCount = 9L)
    assert(newMap === Map("f1" -> Seq("qual2"), "f2" -> Seq(), "f3" -> Seq("qual1")))
    assert(newCols.sorted === Seq("qual1", "qual2"))
  }

  test("regional qualifier suppression above max level") {
    val th = Qualifiers.Thresholds(regionalTimeseriesMaxLevel = 1)
    assert(Qualifiers.qualifiersForLevel(0, Seq("q1"), th) === Seq("q1"))
    assert(Qualifiers.qualifiersForLevel(1, Seq("q1"), th) === Seq("q1"))
    assert(Qualifiers.qualifiersForLevel(2, Seq("q1"), th) === Seq.empty)
  }
}
