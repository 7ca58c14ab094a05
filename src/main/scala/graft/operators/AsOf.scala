package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row with
  * the same key and the LATEST right timestamp `<=` the left timestamp —
  * the standard primitive for "state as of event time" enrichment
  * (feature lookups, latest-price joins, session attribution). `forward`
  * (earliest right `>=`) and `nearest` (closer of the two, ties backward —
  * the pandas merge_asof contract) complete the direction surface.
  *
  * Spark-first plan — the UNION trick, not a range join: tag both sides,
  * union them, and run ONE window per key ordered by (ts, side) taking the
  * last non-null right payload at or before each row. Cost is a single
  * shuffle + sort on the key — the same work as a sort-merge join — while
  * a naive `l.key = r.key AND r.ts <= l.ts` theta-join explodes to
  * O(|left per key| × |right per key|) pairs before its per-pair argmax,
  * the classic 100 TB killer for long-history keys. The key is assumed
  * high-cardinality (users, instruments, sensors); a skewed single key
  * serializes its own sort only.
  */
object AsOf {

  /** Left-as-of join.
    *
    * @param left     probe side; all its columns pass through
    * @param right    build side; must be unique per (`keyCols`, `tsCol`)
    *                 (pre-aggregate otherwise — ambiguous same-instant rows
    *                 would make the result nondeterministic)
    * @param keyCols  equality key columns present on both sides
    * @param tsCol    ordering column name, present on both sides (numeric
    *                 or timestamp)
    * @param payload  right-side columns to carry over (must not collide
    *                 with left column names); null when no right row is at
    *                 or before the left timestamp
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payload: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward | forward | nearest, got '$direction'")
    val keyAndTs = keyCols :+ tsCol
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload columns ${payload.intersect(leftCols).mkString(",")} collide with left side")

    // the matched right timestamp rides inside the payload struct — the
    // `nearest` pick needs both candidates' distances
    val pay = struct((col(tsCol).as("_rts") +: payload.map(col)): _*)
    // side = 1 for right rows so that, at an equal timestamp, the right row
    // sorts BEFORE the left row it should match (ties are `<=` semantics).
    // Null right timestamps are dropped: ascending order sorts nulls FIRST,
    // so a dirty null-ts right row would otherwise become the "latest at or
    // before" match for every left row preceding the real right rows —
    // `r.ts <= l.ts` is never true for a null r.ts
    val rTagged = right.filter(col(tsCol).isNotNull).select(
      keyAndTs.map(col) ++
        Seq(lit(1).as("_side"), pay.as("_payload")) ++
        leftCols.filterNot(keyAndTs.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keyAndTs.map(col) ++
        Seq(lit(0).as("_side"), lit(null).cast(rTagged.schema("_payload").dataType).as("_payload")) ++
        leftCols.filterNot(keyAndTs.contains).map(col): _*)

    // ONE shuffle+sort serves every direction: `last` over the preceding
    // frame is the backward match, `first` over the following frame the
    // forward match — same partitioning and ordering, so the second
    // window evaluates on the already-sorted stream. At an equal
    // timestamp the right row sorts first (side desc), which both frames
    // read as a match — `<=` backward, `>=` forward.
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").desc)
    val wBwd = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // forward-only flips the TIE ordering (left before the equal-ts right)
    // so the following frame still sees a same-instant right row — `>=`
    // semantics. `nearest` keeps the backward tie ordering: the equal-ts
    // match reaches it through the backward candidate at distance 0,
    // which wins every comparison.
    val wFwdTies = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matched = direction match {
      case "backward" =>
        lTagged.unionByName(rTagged)
          .withColumn("_match", last("_payload", ignoreNulls = true).over(wBwd))
      case "forward" =>
        lTagged.unionByName(rTagged)
          .withColumn("_match", first("_payload", ignoreNulls = true).over(wFwdTies))
      case "nearest" =>
        // closer of the two candidates; ties go BACKWARD (the pandas
        // merge_asof contract)
        lTagged.unionByName(rTagged)
          .withColumn("_bwd", last("_payload", ignoreNulls = true).over(wBwd))
          .withColumn("_fwd", first("_payload", ignoreNulls = true).over(wFwd))
          .withColumn("_match",
            when(col("_bwd").isNull, col("_fwd"))
              .when(col("_fwd").isNull, col("_bwd"))
              .when(col(tsCol) - col("_bwd._rts") <= col("_fwd._rts") - col(tsCol),
                col("_bwd"))
              .otherwise(col("_fwd")))
    }
    // pandas merge_asof tolerance: a candidate farther than `tolerance`
    // from the left timestamp is no match at all (nulls out, exactly as
    // if no right row qualified) — applied AFTER direction resolution so
    // `nearest` first picks its side, then the pick must be in range.
    // Timestamp-typed columns subtract to an INTERVAL, which doesn't
    // compare against the bigint tolerance — normalize both operands to
    // long first (unix_micros for timestamps, i.e. tolerance is in
    // MICROSECONDS for timestamp columns and in the column's own unit for
    // numeric ones).
    def asLong(c: Column): Column = left.schema(tsCol).dataType match {
      case _: org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(c.cast("timestamp"))
      case _ => c // numeric columns compare in their own unit, no cast
    }
    val bounded = tolerance.fold(matched)(t =>
      matched.withColumn("_match",
        when(abs(asLong(col(tsCol)) - asLong(col("_match._rts"))) <= t,
          col("_match"))))
    bounded
      .filter(col("_side") === 0)
      .select(leftCols.map(col) ++ payload.map(p => col(s"_match.$p").as(p)): _*)
  }

  /** Convenience overload: payload = every right column that is neither a
    * key nor the timestamp. */
  def joinAsOf(left: DataFrame, right: DataFrame,
               keyCols: Seq[String], tsCol: String): DataFrame =
    joinAsOf(left, right, keyCols, tsCol,
      right.columns.filterNot((keyCols :+ tsCol).contains).toSeq)
}
