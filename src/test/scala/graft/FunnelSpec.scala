package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Golden semantics of the windowFunnel fold: greedy earliest-anchored
  * chains, strict ordering, window cutoff, and the level-0/absent
  * contracts. */
class FunnelSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long, String)],
                  steps: Seq[String], windowMs: Long): Map[Long, (Int, Any, Any)] = {
    import spark.implicits._
    val ev = rows.toDF("user_id", "ts_ms", "event_type")
    Funnel.windowFunnel(ev, "user_id", col("ts_ms"), "event_type", steps, windowMs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.get(2), r.get(3)))).toMap
  }

  test("full chain matches and reports anchor + depth timestamps") {
    val out = run(Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase")),
      Seq("view", "click", "purchase"), 1000L)
    assert(out(1L) === ((3, 100L, 300L)))
  }

  test("steps must be strictly after the previous — equal ts cannot chain") {
    val out = run(Seq(
      (1L, 100L, "view"), (1L, 100L, "click"), (1L, 150L, "purchase")),
      Seq("view", "click", "purchase"), 1000L)
    // click at the same instant as the view doesn't count; purchase can't
    // fire without the click step
    assert(out(1L) === ((1, 100L, 100L)))
  }

  test("window is anchored at the FIRST step-1 event (greedy contract)") {
    // a view at 0 anchors the window [0, 100]; the click at 150 is outside
    // it even though the later view at 120 would have made a full chain —
    // the documented anchored-greedy behavior, not max-over-all-chains
    val out = run(Seq(
      (1L, 0L, "view"), (1L, 120L, "view"), (1L, 150L, "click")),
      Seq("view", "click"), 100L)
    assert(out(1L) === ((1, 0L, 0L)))
    // same events, window 200: the chain closes from the first anchor
    val out2 = run(Seq(
      (1L, 0L, "view"), (1L, 120L, "view"), (1L, 150L, "click")),
      Seq("view", "click"), 200L)
    assert(out2(1L) === ((2, 0L, 150L)))
  }

  test("earliest qualifying event wins each step") {
    val out = run(Seq(
      (1L, 100L, "view"), (1L, 110L, "click"), (1L, 140L, "click"),
      (1L, 150L, "purchase")),
      Seq("view", "click", "purchase"), 1000L)
    assert(out(1L) === ((3, 100L, 150L)))
  }

  test("level 0 for users with step-type events but no step-1") {
    val out = run(Seq(
      (1L, 100L, "click"), (2L, 100L, "view")),
      Seq("view", "click"), 1000L)
    assert(out(1L)._1 === 0)
    assert(out(1L)._2 === null)
    assert(out(2L) === ((1, 100L, 100L)))
  }

  test("users with only non-step events are absent") {
    val out = run(Seq(
      (1L, 100L, "error"), (2L, 100L, "view")),
      Seq("view", "click"), 1000L)
    assert(!out.contains(1L))
    assert(out.contains(2L))
  }

  test("repeated step types need distinct successive events") {
    // steps (view, view): one view reaches level 1, a second strictly
    // later view completes level 2
    val one = run(Seq((1L, 100L, "view")), Seq("view", "view"), 1000L)
    assert(one(1L)._1 === 1)
    val two = run(Seq((1L, 100L, "view"), (1L, 130L, "view")),
      Seq("view", "view"), 1000L)
    assert(two(1L) === ((2, 100L, 130L)))
  }

  test("out-of-order arrival doesn't matter — the fold sorts by time") {
    val out = run(Seq(
      (1L, 300L, "purchase"), (1L, 100L, "view"), (1L, 200L, "click")),
      Seq("view", "click", "purchase"), 1000L)
    assert(out(1L) === ((3, 100L, 300L)))
  }
}
