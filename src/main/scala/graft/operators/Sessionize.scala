package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session until the inter-event gap exceeds `gapMs` — the standard
  * event-stream primitive behind engagement metrics, conversation
  * threading, and interaction-log training data.
  *
  * Plan: ONE window per key ordered by time — `lag` marks session starts
  * (gap > timeout, or first event), a running sum numbers them. Single
  * shuffle+sort on the key, no joins, no iteration; the same shape batch
  * AND streaming engines use (the streaming face is
  * `session_window`/`flatMapGroupsWithState` — see graft.streaming).
  * Keys are users/devices/sensors — high-cardinality, so the shuffle is
  * even; one hot key serializes only its own sort. */
object Sessionize {

  /** Adds `session_seq` (1-based per-key session index) to `events`.
    *
    * @param tieCols extra ordering columns so same-instant events get a
    *                deterministic order (and therefore deterministic
    *                session numbering)
    */
  def withSessions(
      events: DataFrame, keyCols: Seq[String], tsCol: String,
      gapMs: Long, tieCols: Seq[String] = Nil
  ): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val gap = col(tsCol) - lag(col(tsCol), 1).over(w)
    events
      .withColumn("_new_session",
        when(gap.isNull || gap > gapMs, lit(1)).otherwise(lit(0)))
      .withColumn("session_seq",
        sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .drop("_new_session")
  }

  /** One row per (key, session): event count, start/end, duration. */
  def sessionStats(
      events: DataFrame, keyCols: Seq[String], tsCol: String,
      gapMs: Long, tieCols: Seq[String] = Nil
  ): DataFrame =
    withSessions(events, keyCols, tsCol, gapMs, tieCols)
      .groupBy((keyCols :+ "session_seq").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .withColumn("duration_ms", col("session_end") - col("session_start"))
}
