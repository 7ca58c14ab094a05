package graft

import org.apache.spark.sql.functions._

import graft.operators.Frontier

/** Frontier politeness scheduling: rank/offset semantics, deterministic
  * ties, the per-host cap, and the two-phase pre-prune's equality with
  * the plain global rank under any input partitioning. */
class FrontierSpec extends SparkSpec {

  private def urls(rows: (String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("host", "url", "priority")
  }

  test("per-host ranks by priority desc, url asc ties; offsets step by delay") {
    val d = urls(
      ("a.com", "http://a.com/low", 1L),
      ("a.com", "http://a.com/hi", 9L),
      ("a.com", "http://a.com/tie-b", 5L),
      ("a.com", "http://a.com/tie-a", 5L),
      ("b.com", "http://b.com/only", 3L))
    val out = Frontier.schedule(d, "host", "url", "priority",
        perHostDelaySec = 2)
      .select("host", "url", "fetch_rank", "scheduled_offset_sec")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getInt(2), r.getLong(3))).toSet
    assert(out === Set(
      ("a.com", "http://a.com/hi", 1, 0L),
      ("a.com", "http://a.com/tie-a", 2, 2L),
      ("a.com", "http://a.com/tie-b", 3, 4L),
      ("a.com", "http://a.com/low", 4, 6L),
      ("b.com", "http://b.com/only", 1, 0L)))
  }

  test("maxPerHost caps the queue; two-phase equals plain rank at any partitioning") {
    import spark.implicits._
    // 3 hosts x 40 urls with colliding priorities — ties everywhere
    val rows = for (h <- 0 until 3; i <- 0 until 40)
      yield (s"h$h.com", f"http://h$h.com/p$i%02d", (i * 7 % 11).toLong)
    val base = rows.toDF("host", "url", "priority")
    def ranked(df: org.apache.spark.sql.DataFrame) =
      Frontier.schedule(df, "host", "url", "priority", 1, Some(5))
        .select("host", "url", "fetch_rank").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val expected = ranked(base)
    assert(expected.size === 15) // 5 per host
    // the pre-prune must be invisible to the result under ANY layout
    Seq(base.repartition(1), base.repartition(13),
        base.repartition(7, col("url"))).foreach { layout =>
      assert(ranked(layout) === expected)
    }
    // cap semantics: the kept 5 are the host's true top-5
    val full = Frontier.schedule(base, "host", "url", "priority", 1, None)
      .filter(col("fetch_rank") <= 5)
      .select("host", "url", "fetch_rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(expected === full)
  }

  test("per-host delays: offsets step by each host's own politeness") {
    import spark.implicits._
    val d = Seq(
      ("a.com", "http://a.com/1", 2L, 0.5),
      ("a.com", "http://a.com/2", 1L, 0.5),
      ("b.com", "http://b.com/1", 9L, 3.0),
      ("b.com", "http://b.com/2", 8L, 3.0),
      ("b.com", "http://b.com/3", 7L, 3.0))
      .toDF("host", "url", "priority", "delay")
    val out = Frontier.scheduleWithDelays(d, "host", "url", "priority", "delay")
      .select("url", "fetch_rank", "scheduled_offset_sec")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(out === Set(
      ("http://a.com/1", 1, 0.0), ("http://a.com/2", 2, 0.5),
      ("http://b.com/1", 1, 0.0), ("http://b.com/2", 2, 3.0),
      ("http://b.com/3", 3, 6.0)))
  }

  test("zero delay schedules everything at offset 0; rank still orders") {
    val d = urls(("a.com", "http://a.com/x", 2L), ("a.com", "http://a.com/y", 1L))
    val out = Frontier.schedule(d, "host", "url", "priority", 0)
      .select("url", "fetch_rank", "scheduled_offset_sec")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(out === Set(("http://a.com/x", 1, 0L), ("http://a.com/y", 2, 0L)))
  }
}
