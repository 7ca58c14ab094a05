package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row with
  * the same key and the LATEST right timestamp `<=` the left timestamp —
  * the standard primitive for "state as of event time" enrichment
  * (feature lookups, latest-price joins, session attribution).
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
      payload: Seq[String]
  ): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val keyAndTs = keyCols :+ tsCol
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload columns ${payload.intersect(leftCols).mkString(",")} collide with left side")

    // side = 1 for right rows so that, at an equal timestamp, the right row
    // sorts BEFORE the left row it should match (ties are `<=` semantics).
    // Null right timestamps are dropped: ascending order sorts nulls FIRST,
    // so a dirty null-ts right row would otherwise become the "latest at or
    // before" match for every left row preceding the real right rows —
    // `r.ts <= l.ts` is never true for a null r.ts
    val rTagged = right.filter(col(tsCol).isNotNull).select(
      keyAndTs.map(col) ++
        Seq(lit(1).as("_side"), struct(payload.map(col): _*).as("_payload")) ++
        leftCols.filterNot(keyAndTs.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keyAndTs.map(col) ++
        Seq(lit(0).as("_side"), lit(null).cast(rTagged.schema("_payload").dataType).as("_payload")) ++
        leftCols.filterNot(keyAndTs.contains).map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("_match", last("_payload", ignoreNulls = true).over(w))
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
