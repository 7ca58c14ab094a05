package graft

import org.apache.spark.sql.Row

import graft.model.Schema
import graft.operators.Validate

/** Golden semantics of P1-P9 validation
  * (reference: tests/unit/test_validate_and_fix.py:9-113). */
class ValidateSpec extends SparkSpec {

  test("drops all-null/whitespace columns, keeps partially-filled ones") {
    val in = df(
      "timestamp LONG, feature STRING, value DOUBLE, lat DOUBLE, lng DOUBLE, " +
        "country STRING, other_col DOUBLE, other_col2 STRING", Seq(
        Row(1L, "A", 1.1, 1.1, null, null, 1.0, null),
        Row(2L, "B", 2.2, 2.2, 2.2, null, null, null),
        Row(3L, "C", 3.3, null, 3.3, null, null, "   ")))
    val res = Validate(in, "weight", 0L)
    assert(res.df.columns.toSet ===
      Set("timestamp", "feature", "value", "lat", "lng", "other_col"))
    assert(res.droppedColumns.toSet === Set("country", "other_col2"))
  }

  test("coerces string-typed numerics; garbage becomes null (ANSI-safe)") {
    val in = df(
      "timestamp LONG, feature STRING, value STRING, lat STRING, lng STRING", Seq(
        Row(1L, "A", "1.1", "string", "1.1"),
        Row(2L, "B", "2.2", "2.2", "2.2"),
        Row(3L, "C", "3.3", "3.3", "3.3")))
    val res = Validate(in, "weight", 0L)
    val fields = res.df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("value") === "double")
    assert(fields("lat") === "double")
    assert(fields("lng") === "double")
    val latOfA = res.df.filter(res.df("feature") === "A").select("lat").head()
    assert(latOfA.isNullAt(0))
  }

  test("counts+fills missing timestamps, counts missing values, fills categoricals") {
    val in = df(
      "timestamp LONG, feature STRING, value DOUBLE, lat DOUBLE, lng DOUBLE, country STRING", Seq(
        Row(1L, "A", null, 1.1, 1.1, "val1"),
        Row(null, "B", null, 2.2, 2.2, null),
        Row(3L, "C", null, 3.3, 3.3, "val2")))
    val res = Validate(in, "weight", 0L)
    assert(res.numMissingTs === 1)
    assert(res.numMissingVal === 3)
    val rows = res.df.select("timestamp", "country").collect().map(_.toSeq).toSet
    assert(rows === Set(Seq(1L, "val1"), Seq(0L, "None"), Seq(3L, "val2")))
  }

  test("string timestamps: garbage counts as missing, no ANSI crash") {
    val in = df(
      "timestamp STRING, feature STRING, value DOUBLE", Seq(
        Row("1000", "A", 1.0),
        Row("garbage", "B", 2.0),   // unparseable -> missing, filled
        Row(null, "C", 3.0)))
    val res = Validate(in, "", fillTimestamp = 42L)
    assert(res.numMissingTs === 2)  // null AND unparseable
    val ts = res.df.select("timestamp", "feature").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(ts === Map("A" -> 1000L, "B" -> 42L, "C" -> 42L))
  }

  test("a lone lat column (no lng) is still coerced to double") {
    val in = df("timestamp LONG, feature STRING, value DOUBLE, lat STRING", Seq(
      Row(1L, "A", 1.0, "3.5"),
      Row(2L, "B", 2.0, "junk")))
    val res = Validate(in, "", 0L)
    assert(res.df.schema("lat").dataType.typeName === "double")
    val lat = res.df.select("feature", "lat").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(lat === Map("A" -> Some(3.5), "B" -> None))
  }

  test("an empty frame validates without NPE") {
    val in = df("timestamp LONG, feature STRING, value DOUBLE", Seq.empty)
    val res = Validate(in, "", 0L)
    assert(res.df.count() === 0L)
    assert(res.numMissingTs === 0L && res.numMissingVal === 0L)
  }

  test("weight column coercion with null->0; absent weight disables weighting") {
    val in = df(
      "timestamp LONG, feature STRING, value DOUBLE, other_col STRING", Seq(
        Row(1L, "A", 1.1, "1"),
        Row(2L, "B", 2.2, null),
        Row(3L, "C", 3.3, "2")))
    val res = Validate(in, "other_col", 0L)
    assert(res.weightColumn === "other_col")
    assert(res.df.select("other_col").collect().map(_.getDouble(0)).sorted.toSeq === Seq(0.0, 1.0, 2.0))

    assert(Validate(in, "other_col2", 0L).weightColumn === "")
    assert(Validate(in, "", 0L).weightColumn === "")
  }

  test("infinity scrub, extreme-timestamp drop, object-store char strip") {
    val in = df(
      "timestamp LONG, feature STRING, value DOUBLE, country STRING, admin1 STRING", Seq(
        Row(1L, "A", Double.PositiveInfinity, "c1", "val1//2"),
        Row(2L, "B", Double.NegativeInfinity, "c2", "val2"),
        Row(Schema.MaxTimestampMs + 1, "C", 3.4, "c3", "val3")))
    val res = Validate(in, "weight", 0L)
    assert(res.numInvalidTs === 1)
    val rows = res.df.select("timestamp", "value", "admin1").collect()
    assert(rows.length === 2)
    assert(rows.forall(_.isNullAt(1))) // infinities nulled
    assert(rows.map(_.getString(2)).toSet === Set("val12", "val2"))
    // infinities were NOT counted as missing values (counter runs pre-scrub)
    assert(res.numMissingVal === 0)
  }

  test("qualifier columns are the non-required columns minus the weight column") {
    // reference: tests/unit/test_get_qualifer_columns.py:23-35
    val in = df(
      "timestamp LONG, country STRING, admin1 STRING, admin2 STRING, admin3 STRING, " +
        "lat DOUBLE, lng DOUBLE, feature STRING, value DOUBLE, qual1 STRING, qual2 STRING",
      Seq(Row(4L, "United States", "New York", "nyadmi2", "nyadmin3",
        1.1, 3.3, "A", 6.2, "d", "q2a")))
    assert(Validate.qualifierColumns(in, "").sorted === Seq("qual1", "qual2"))
    assert(Validate.qualifierColumns(in, "qual1") === Seq("qual2"))
  }
}
