package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schema

/** Region-hierarchy helpers. The hierarchy is positional, not relational: a
  * region's identity at admin level k is the `__`-join of its ancestor names,
  * with absent levels participating as the literal "None"
  * (reference: flows/common.py:473-497).
  */
object Regions {

  /** Ordered intersection of the frame's columns with the admin hierarchy,
    * country first (reference: flows/common.py:488-497). */
  def extractRegionColumns(df: DataFrame): Seq[String] =
    Schema.RegionLevels.filter(df.columns.contains)

  /** Region-id column at the given level (0=country .. 3=admin3). Absent
    * levels are the literal "None" (reference: flows/common.py:473-485).
    * Pure `concat_ws` — codegen'd, no UDF. */
  def joinRegionColumns(presentCols: Seq[String], level: Int, delim: String = Schema.RegionDelim): Column = {
    val parts = Schema.RegionLevels.take(level + 1).map { name =>
      if (presentCols.contains(name)) col(name) else lit(Schema.NoneStr)
    }
    concat_ws(delim, parts: _*)
  }

  /** Adds a `region_id` column at the given admin level. */
  def withRegionId(df: DataFrame, level: Int): DataFrame =
    df.withColumn("region_id", joinRegionColumns(extractRegionColumns(df), level))
}
