package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the "dataset card" stats a corpus publisher ships
  * next to the parquet: per-column row/null/distinct counts and
  * lexicographic min/max, computed in ONE pass over the data.
  *
  * Plan shape: a single aggregation computes every column's five
  * statistics (Catalyst plans the multiple exact COUNT(DISTINCT)s as one
  * Expand + two-stage aggregate — one corpus scan, one shuffle whose
  * width is rows × |cols| of the expand, not a pass per column), and the
  * per-column rows unpivot from that 1-row aggregate via `stack` — the
  * unpivot touches one row, never the corpus. Values are compared as
  * canonical strings so the profile is type-agnostic and the mirror is
  * hash-exact (min/max on the string CAST of numerics would order
  * lexicographically on both engines; for numeric columns the numeric
  * min/max is taken FIRST, then cast — so 9 < 10 profiles correctly). */
object Profile {

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    // backtick-quote every spliced identifier (and escape embedded
    // backticks) so columns named with spaces/quotes/dots profile
    // correctly instead of breaking the stack() parse
    def bt(name: String): String = "`" + name.replace("`", "``") + "`"
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(bt(c))).as(s"${c}__nonnull"),
        count_distinct(col(bt(c))).as(s"${c}__distinct"),
        min(col(bt(c))).cast("string").as(s"${c}__min"),
        max(col(bt(c))).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackExpr = cols.map { c =>
      val lbl = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$lbl', ${bt(s"${c}__nonnull")}, ${bt(s"${c}__distinct")}, ${bt(s"${c}__min")}, ${bt(s"${c}__max")}"
    }.mkString(", ")
    one.selectExpr("__rows",
        s"stack(${cols.length}, $stackExpr) AS (column, n_nonnull, n_distinct, min_v, max_v)")
      .select(col("column"), col("__rows").as("n_rows"),
        (col("__rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_v"), col("max_v"))
  }
}
