package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Json
import graft.pipeline.Pipeline

/** Byte-exact port of the reference's record_results goldens
  * (tests/unit/test_record_results.py:70-158): the with-tiles full run and
  * the no-tiles / no-summary / no-monthly run. The expected strings are the
  * reference's asserted JSON payloads verbatim (python json.dumps spacing).
  */
class ResultsJsonSpec extends AnyFunSuite {

  private def summaryEntry(name: String, vals: Seq[Double]): Json.JValue =
    Json.JObj(("name" -> Json.JStr(name)) +: Seq(
      "s_min_t_sum", "s_max_t_sum", "s_sum_t_sum", "s_mean_t_sum",
      "s_min_t_mean", "s_max_t_mean", "s_sum_t_mean", "s_mean_t_mean"
    ).zip(vals.map(Json.JDouble)))

  test("full run with tiles and summary matches the reference golden") {
    val summary = Json.JArr(Seq(
      summaryEntry("Feature1", Seq(3.3, 12.0, 31.8, 7.95, 1.1, 4.0, 10.6, 2.65)),
      summaryEntry("Feature2", Seq(6.3, 20.2, 48.8, 12.2, 2.1, 5.4, 14.6, 3.65))))
    val got = Pipeline.recordResultsJson(
      numRows = 120,
      rowsPerFeature = scala.collection.immutable.ListMap("f1" -> 60L, "f2" -> 60L),
      numMissingTs = 5, numInvalidTs = 10, numMissingVal = 1,
      regionColumns = Seq("country", "admin1"),
      features = Seq("f1", "f2"),
      rawCountThreshold = 30,
      computeTiles = true, computeMonthly = true, computeAnnual = true,
      hasWeights = false,
      monthTsSize = Some(scala.collection.immutable.ListMap("f1" -> 20L, "f2" -> 30L)),
      yearTsSize = Some(scala.collection.immutable.ListMap("f1" -> 10L, "f2" -> 10L)),
      summaryValues = Some(summary))
    val expected =
      """{"data_info": {"num_rows": 120, "num_rows_per_feature": {"f1": 60, "f2": 60}, """ +
        """"num_missing_ts": 5, "num_invalid_ts": 10, "num_missing_val": 1, """ +
        """"region_levels": ["country", "admin1", "grid data"], "features": ["f1", "f2"], """ +
        """"raw_count_threshold": 30, "has_tiles": true, "has_monthly": true, """ +
        """"has_annual": true, "has_weights": false, """ +
        """"month_timeseries_size": {"f1": 20, "f2": 30}, """ +
        """"year_timeseries_size": {"f1": 10, "f2": 10}}, """ +
        """"output_agg_values": [{"name": "Feature1", "s_min_t_sum": 3.3, """ +
        """"s_max_t_sum": 12.0, "s_sum_t_sum": 31.8, "s_mean_t_sum": 7.95, """ +
        """"s_min_t_mean": 1.1, "s_max_t_mean": 4.0, "s_sum_t_mean": 10.6, """ +
        """"s_mean_t_mean": 2.65}, {"name": "Feature2", "s_min_t_sum": 6.3, """ +
        """"s_max_t_sum": 20.2, "s_sum_t_sum": 48.8, "s_mean_t_sum": 12.2, """ +
        """"s_min_t_mean": 2.1, "s_max_t_mean": 5.4, "s_sum_t_mean": 14.6, """ +
        """"s_mean_t_mean": 3.65}]}"""
    assert(got === expected)
  }

  test("no-tiles, no-summary, no-monthly run matches the reference golden") {
    // reference passes month_ts_size but compute_monthly=False (excluded) and
    // year_ts_size=None with compute_annual=True (also excluded)
    val got = Pipeline.recordResultsJson(
      numRows = 120,
      rowsPerFeature = scala.collection.immutable.ListMap("f1" -> 60L, "f2" -> 60L),
      numMissingTs = 5, numInvalidTs = 10, numMissingVal = 1,
      regionColumns = Seq("country", "admin1"),
      features = Seq("f1", "f2"),
      rawCountThreshold = 30,
      computeTiles = false, computeMonthly = false, computeAnnual = true,
      hasWeights = false,
      monthTsSize = Some(scala.collection.immutable.ListMap("f1" -> 20L, "f2" -> 30L)),
      yearTsSize = None,
      summaryValues = None)
    val expected =
      """{"data_info": {"num_rows": 120, "num_rows_per_feature": {"f1": 60, "f2": 60}, """ +
        """"num_missing_ts": 5, "num_invalid_ts": 10, "num_missing_val": 1, """ +
        """"region_levels": ["country", "admin1"], "features": ["f1", "f2"], """ +
        """"raw_count_threshold": 30, "has_tiles": false, "has_monthly": false, """ +
        """"has_annual": true, "has_weights": false}}"""
    assert(got === expected)
  }
}
