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

  test("null delays fail loudly by default, coalesce when a default is given") {
    import spark.implicits._
    val d = Seq(
      ("a.com", "http://a.com/1", 2L, Some(0.5)),
      ("b.com", "http://b.com/1", 1L, None)) // host missing from delay frame
      .toDF("host", "url", "priority", "delay")
    // default: the first null delay is a job failure naming the host,
    // never a null offset carrying a live fetch_rank
    val e = intercept[Exception] {
      Frontier.scheduleWithDelays(d, "host", "url", "priority", "delay")
        .collect()
    }
    assert(e.getMessage.contains("null delay") ||
      Option(e.getCause).exists(_.getMessage.contains("null delay")))
    // with a crawler default: coalesced in-operator, no null offsets
    val out = Frontier.scheduleWithDelays(d, "host", "url", "priority",
        "delay", defaultDelaySec = Some(2.0))
      .select("url", "fetch_rank", "scheduled_offset_sec")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(out === Set(
      ("http://a.com/1", 1, 0.0), ("http://b.com/1", 1, 0.0)))
    val two = Seq(
      ("b.com", "http://b.com/1", 9L, None: Option[Double]),
      ("b.com", "http://b.com/2", 8L, None))
      .toDF("host", "url", "priority", "delay")
    val offs = Frontier.scheduleWithDelays(two, "host", "url", "priority",
        "delay", defaultDelaySec = Some(2.0))
      .select("url", "scheduled_offset_sec")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(offs === Set(("http://b.com/1", 0.0), ("http://b.com/2", 2.0)))
  }

  test("mergeSchedule: standing rows survive byte-for-byte, new keys append after the tail") {
    import spark.implicits._
    val standing = Frontier.schedule(urls(
      ("a.com", "http://a.com/q1", 5L),
      ("a.com", "http://a.com/q2", 3L),
      ("b.com", "http://b.com/q1", 1L)), "host", "url", "priority", 2)
    // delta: one already-standing key (higher priority — must NOT
    // displace), two new keys for a.com, one for a brand-new host
    val discovered = urls(
      ("a.com", "http://a.com/q1", 99L), // dup key, new priority: dropped
      ("a.com", "http://a.com/n-hi", 9L),
      ("a.com", "http://a.com/n-lo", 1L),
      ("c.com", "http://c.com/first", 4L))
    val out = Frontier.mergeSchedule(standing, discovered,
        "host", "url", "priority", perHostDelaySec = 2)
      .select("host", "url", "priority", "fetch_rank", "scheduled_offset_sec")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getLong(4))).toSet
    assert(out === Set(
      // standing: untouched ranks/offsets, original priorities
      ("a.com", "http://a.com/q1", 5L, 1, 0L),
      ("a.com", "http://a.com/q2", 3L, 2, 2L),
      ("b.com", "http://b.com/q1", 1L, 1, 0L),
      // appended: rank continues after a.com's tail (2), priority desc
      ("a.com", "http://a.com/n-hi", 9L, 3, 4L),
      ("a.com", "http://a.com/n-lo", 1L, 4, 6L),
      // new host starts at rank 1, exactly as schedule() would
      ("c.com", "http://c.com/first", 4L, 1, 0L)))
  }

  test("mergeSchedule: fractional standing offsets survive exactly; delta dedups on (host,url)") {
    import spark.implicits._
    // a standing queue built by scheduleWithDelays: offsets are DOUBLE
    // (Crawl-delay 0.5 s) — the merge must not truncate them to longs
    val standing = Frontier.scheduleWithDelays(
      Seq(("a.com", "http://a.com/q1", 5L, 0.5),
        ("a.com", "http://a.com/q2", 3L, 0.5))
        .toDF("host", "url", "priority", "delay"),
      "host", "url", "priority", "delay")
      .drop("delay")
    // the same new URL discovered from two pages with different
    // priorities: ONE appended row, max priority wins
    val discovered = urls(
      ("a.com", "http://a.com/n1", 2L),
      ("a.com", "http://a.com/n1", 9L))
    val out = Frontier.mergeSchedule(standing, discovered,
        "host", "url", "priority", perHostDelaySec = 2)
      .select("url", "priority", "fetch_rank", "scheduled_offset_sec")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    assert(out === Set(
      ("http://a.com/q1", 5L, 1, 0.0),
      ("http://a.com/q2", 3L, 2, 0.5), // the 0.5 politeness slot intact
      ("http://a.com/n1", 9L, 3, 4.0))) // one row, max priority, double arith
  }

  test("mergeScheduleWithDelays continues each host's offsets with the HOST's delay") {
    import spark.implicits._
    val standing = Frontier.scheduleWithDelays(
      Seq(("a.com", "http://a.com/q1", 5L, 0.5),
        ("b.com", "http://b.com/q1", 5L, 3.0),
        ("b.com", "http://b.com/q2", 4L, 3.0))
        .toDF("host", "url", "priority", "delay"),
      "host", "url", "priority", "delay").drop("delay")
    val discovered = Seq(
      ("a.com", "http://a.com/n1", 9L, Some(0.5)),
      ("b.com", "http://b.com/n1", 9L, Some(3.0)),
      ("c.com", "http://c.com/n1", 1L, None)) // no delay row for c.com
      .toDF("host", "url", "priority", "delay")
    // default-delay path: c.com coalesces 2.0; a/b continue their own
    val out = Frontier.mergeScheduleWithDelays(standing, discovered,
        "host", "url", "priority", "delay", defaultDelaySec = Some(2.0))
      .select("url", "fetch_rank", "scheduled_offset_sec")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(out === Set(
      ("http://a.com/q1", 1, 0.0),
      ("http://b.com/q1", 1, 0.0), ("http://b.com/q2", 2, 3.0),
      ("http://a.com/n1", 2, 0.5),   // a.com's own 0.5 delay continues
      ("http://b.com/n1", 3, 6.0),   // b.com's 3.0 delay continues
      ("http://c.com/n1", 1, 0.0)))  // new host, rank 1, offset 0
    // null-delay strict path: the merge fails loudly, like the scheduler
    val e = intercept[Exception] {
      Frontier.mergeScheduleWithDelays(standing, discovered,
        "host", "url", "priority", "delay").collect()
    }
    assert(e.getMessage.contains("null delay") ||
      Option(e.getCause).exists(_.getMessage.contains("null delay")))
  }

  test("mergeSchedule maxPerHost drops appended overflow, never standing rows") {
    val standing = Frontier.schedule(urls(
      ("a.com", "http://a.com/q1", 5L),
      ("a.com", "http://a.com/q2", 3L)), "host", "url", "priority", 1)
    val discovered = urls(
      ("a.com", "http://a.com/n1", 9L),
      ("a.com", "http://a.com/n2", 8L),
      ("a.com", "http://a.com/n3", 7L))
    val out = Frontier.mergeSchedule(standing, discovered,
        "host", "url", "priority", 1, maxPerHost = Some(3))
      .select("url", "fetch_rank")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    // both standing rows kept; only the single slot under the cap fills
    assert(out === Set(
      ("http://a.com/q1", 1), ("http://a.com/q2", 2),
      ("http://a.com/n1", 3)))
    // idempotence: re-merging the same delta adds nothing
    val merged = Frontier.mergeSchedule(standing, discovered,
      "host", "url", "priority", 1, maxPerHost = Some(3))
    val again = Frontier.mergeSchedule(merged, discovered,
        "host", "url", "priority", 1, maxPerHost = Some(3))
      .select("url", "fetch_rank")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(again === out)
  }

  test("zero delay schedules everything at offset 0; rank still orders") {
    val d = urls(("a.com", "http://a.com/x", 2L), ("a.com", "http://a.com/y", 1L))
    val out = Frontier.schedule(d, "host", "url", "priority", 0)
      .select("url", "fetch_rank", "scheduled_offset_sec")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(out === Set(("http://a.com/x", 1, 0L), ("http://a.com/y", 2, 0L)))
  }
}
