package graft

import org.apache.spark.sql.functions._

import graft.operators.Retention

/** Hand-computed cohort-retention fixtures. */
class RetentionSpec extends SparkSpec {

  private def matrix(rows: Seq[(Long, Long)], periodMs: Long): Map[(Long, Long), Long] = {
    import spark.implicits._
    Retention.cohortRetention(rows.toDF("user_id", "ts_ms"), "user_id",
        col("ts_ms"), periodMs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("retention matrix matches the hand-computed cohort fixture") {
    // period = 10ms. u1: periods {0,1,3} (cohort 0); u2: {1,2} (cohort 1);
    // u3: {0} (cohort 0). Duplicate activity within a period counts once.
    val ev = Seq((1L, 5L), (1L, 7L), (1L, 15L), (1L, 35L),
      (2L, 15L), (2L, 25L), (3L, 5L))
    val m = matrix(ev, periodMs = 10L)
    assert(m === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("single-period users land only on the diagonal") {
    val m = matrix(Seq((1L, 3L), (2L, 13L), (3L, 23L)), periodMs = 10L)
    assert(m === Map((0L, 0L) -> 1L, (1L, 0L) -> 1L, (2L, 0L) -> 1L))
    assert(m.keys.forall(_._2 == 0L))
  }

  test("offset-0 count is the cohort size (every cohort member is active then)") {
    val ev = Seq((1L, 0L), (1L, 10L), (2L, 0L), (2L, 20L), (3L, 0L), (4L, 10L))
    val m = matrix(ev, periodMs = 10L)
    assert(m((0L, 0L)) === 3L) // users 1, 2, 3
    assert(m((1L, 0L)) === 1L) // user 4
    // retention never exceeds the cohort's offset-0 size
    assert(m.filter(_._1._1 == 0L).values.max === 3L)
  }
}
