package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed range join: match point rows to interval rows without a
  * theta join.
  *
  * Spark plans a raw `p >= lo AND p < hi` join predicate as a broadcast
  * nested loop (or a cartesian product when neither side broadcasts) —
  * every point against every interval, unusable past toy sizes. The
  * standard rewrite (used by every warehouse engine's range-join
  * optimization) turns it into an EQUI-join: intervals replicate to each
  * fixed-width bin they overlap, points bin once, the join runs on
  * (keys..., bin) through the normal hash/sort-merge machinery — shuffled,
  * skew-handleable, AQE-planned — and the exact `lo <= p < hi` predicate
  * filters the per-bin candidates.
  *
  * Cost model: interval replication is `ceil(len/binWidth) + 1` rows, and
  * per-bin work is (points in bin) × (intervals covering bin), so
  * `binWidth` trades replication against candidate fanout — set it near
  * the TYPICAL interval length. A point matches an overlapping interval
  * in exactly ONE bin (the point's own bin), so no dedup pass is needed —
  * this is the property that makes point-in-interval strictly cheaper
  * than general interval-overlap joins.
  */
object RangeJoin {

  /** Floor division as a Column (exact long arithmetic, correct for
    * negative values — `pmod` is always non-negative). */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / lit(w)).cast("long")

  /** Inner-join `points` to the intervals of `ranges` that contain them:
    * result = one row per (point, containing interval) pair, carrying all
    * columns of both sides. Containment is `lo <= p < hi` on matching
    * `keys` (pass `keys = Nil` for a pure range join). Intervals with
    * `hi <= lo` are empty and match nothing; NULL points/bounds never
    * match (SQL comparison semantics).
    *
    * `binWidth` is in the column's own units (e.g. ms for epoch-ms
    * columns). Scale shape: one exchange per side on (keys, bin) — or a
    * broadcast of the replicated interval side when it is small — then a
    * codegen'd residual filter; never a nested-loop plan.
    */
  def joinPointInRange(
      points: DataFrame,
      ranges: DataFrame,
      keys: Seq[String],
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val dupes = (ranges.columns.toSet - loCol - hiCol -- keys)
      .intersect(points.columns.toSet -- keys)
    require(dupes.isEmpty,
      s"ambiguous payload columns present on both sides: ${dupes.mkString(", ")}")
    // hi is exclusive: the last covered bin is the one holding hi-1
    val binned = ranges
      .where(col(loCol) < col(hiCol))
      .withColumn("_bin",
        explode(sequence(floorDiv(col(loCol), binWidth),
          floorDiv(col(hiCol) - 1, binWidth))))
    points
      .withColumn("_bin", floorDiv(col(pointCol), binWidth))
      .join(binned, keys :+ "_bin")
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }

  /** Inner-join interval rows of `left` to the OVERLAPPING interval rows
    * of `right` on matching `keys`: overlap is `aLo < bHi AND bLo < aHi`
    * (half-open intervals; touching endpoints do not overlap). One output
    * row per overlapping pair.
    *
    * Both sides replicate to their covered bins, the join runs on
    * (keys, bin) — but an overlapping pair shares EVERY bin their spans
    * both cover, so the naive bin join duplicates it. Rather than a
    * distinct pass (a second full shuffle keyed by pair), the join keeps
    * only the FIRST shared bin: `bin == max(floorDiv(aLo), floorDiv(bLo))`
    * — the first bin where both intervals are live, a per-row predicate
    * that is codegen'd into the join's residual filter. Every overlapping
    * pair has exactly one such bin, so the result is exact with zero
    * extra exchanges. */
  def joinIntervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftLo: String,
      leftHi: String,
      rightLo: String,
      rightHi: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(Seq(leftLo, leftHi).intersect(Seq(rightLo, rightHi)).isEmpty,
      "left and right bound columns must have distinct names")
    val dupes = (right.columns.toSet - rightLo - rightHi -- keys)
      .intersect(left.columns.toSet -- keys)
    require(dupes.isEmpty,
      s"ambiguous payload columns present on both sides: ${dupes.mkString(", ")}")
    def binned(df: DataFrame, lo: String, hi: String) = df
      .where(col(lo) < col(hi))
      .withColumn("_bin",
        explode(sequence(floorDiv(col(lo), binWidth),
          floorDiv(col(hi) - 1, binWidth))))
    binned(left, leftLo, leftHi)
      .join(binned(right, rightLo, rightHi), keys :+ "_bin")
      .where(col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi) &&
        col("_bin") === greatest(floorDiv(col(leftLo), binWidth),
          floorDiv(col(rightLo), binWidth)))
      .drop("_bin")
  }
}
