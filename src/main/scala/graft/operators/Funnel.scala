package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Ordered-sequence (conversion-funnel) matching over an event stream —
  * the windowFunnel analytics primitive: how deep into the step sequence
  * s1 → s2 → … → sk did each user get, where every step must occur
  * STRICTLY after the previous one and within `windowMs` of the user's
  * anchor (their earliest s1 event).
  *
  * Contract (deterministic, oracle-mirrorable):
  *  - anchor t1 = the user's earliest s1 event;
  *  - t(i) = the earliest s(i) event with ts > t(i−1) and
  *    ts ≤ t1 + windowMs (greedy earliest-chain, anchored at the first
  *    s1 — the ClickHouse-windowFunnel-style contract);
  *  - level = number of steps matched (0..k); same-timestamp events
  *    cannot chain (strict >).
  *
  * Plan shape — ONE corpus shuffle, no self-joins: events are filtered
  * to the step types (the only types that can matter), grouped per
  * user, time-sorted, and the chain is computed by a single
  * `aggregate` fold over the sorted (ts, type) structs. The k-step
  * unrolled-join formulation the SQL oracle uses would be k corpus
  * joins; here k only widens the fold's accumulator array. Per-user
  * state is the events OF THE STEP TYPES for that user — the type
  * filter is what bounds it (a 100 TB stream is mostly non-step events);
  * a pathological single user still bounded by maxEventsPerUser if set.
  *
  * Returns (user, level, anchor_ms, depth_ms): depth = timestamp of the
  * deepest matched step, NULL with anchor when level = 0. */
object Funnel {

  def windowFunnel(
      events: DataFrame,
      userCol: String,
      tsMsCol: Column,
      typeCol: String,
      steps: Seq[String],
      windowMs: Long
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.length
    val stepsLit = typedLit(steps)
    val evs = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), tsMsCol.cast(LongType).as("ms"),
        col(typeCol).as("et"))
    val init = array(Seq.fill(k)(lit(null).cast(LongType)): _*)
    val folded = evs
      .groupBy(userCol)
      .agg(sort_array(collect_list(struct(col("ms"), col("et")))).as("evs"))
      .select(col(userCol), aggregate(col("evs"), init, (acc, e) =>
        // one pass over the time-sorted events; transform reads the
        // PRE-event accumulator, so a single event fills at most one
        // slot and the non-null prefix invariant holds (slot i needs
        // slot i-1 already set by an EARLIER event — the strict-after
        // contract for free)
        transform(acc, (x, i) => {
          val wantType = e.getField("et") === element_at(stepsLit, i + 1)
          val eligible = when(i === 0, wantType)
            .otherwise(wantType &&
              element_at(acc, i).isNotNull &&
              e.getField("ms") > element_at(acc, i) &&
              e.getField("ms") <= element_at(acc, lit(1)) + lit(windowMs))
          when(x.isNotNull, x).otherwise(when(eligible, e.getField("ms")))
        })).as("chain"))
    folded.select(
      col(userCol),
      size(filter(col("chain"), x => x.isNotNull)).as("level"),
      element_at(col("chain"), 1).as("anchor_ms"),
      element_at(col("chain"),
        greatest(size(filter(col("chain"), x => x.isNotNull)), lit(1)))
        .as("depth_ms"))
  }
}
