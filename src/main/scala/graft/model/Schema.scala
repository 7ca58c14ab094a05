package graft.model

/** Column-name constants and engine constants for the datacube surface.
  *
  * Semantics derived from the reference pipeline's column contract
  * (reference: flows/common.py:20-31, flows/data_pipeline.py:112-134).
  */
object Schema {
  /** Admin hierarchy, coarse to fine (reference: flows/common.py:20). */
  val RegionLevels: Seq[String] = Seq("country", "admin1", "admin2", "admin3")

  /** Required datacube columns (reference: flows/common.py:21-31). */
  val RequiredCols: Set[String] =
    Set("timestamp", "country", "admin1", "admin2", "admin3", "lat", "lng", "feature", "value")

  /** Literal used for missing categorical values (reference: flows/data_pipeline.py:344-345). */
  val NoneStr = "None"

  /** Separator for hierarchical region ids, e.g. `Ethiopia__Amhara`
    * (reference: flows/common.py:473-485). */
  val RegionDelim = "__"

  /** Rows with epoch-ms timestamps at/above this are invalid and dropped
    * (reference: flows/data_pipeline.py:130-132). */
  val MaxTimestampMs: Long = (Long.MaxValue / 1e6).toLong

  /** Slippy-map zoom of the finest subtile grid (reference: flows/data_pipeline.py:112-126). */
  val MaxSubtilePrecision = 14

  /** Zoom-level difference between a tile and the subtiles binned inside it:
    * each tile carries a 2^6 x 2^6 = 4096-bin grid (reference: flows/data_pipeline.py:112). */
  val LevelDiff = 6

  /** Max tile zoom = MaxSubtilePrecision - LevelDiff = 8. */
  val MaxTileZoom: Int = MaxSubtilePrecision - LevelDiff

  /** Temporal resolutions of the aggregation matrix. */
  val TimeResolutions: Seq[String] = Seq("month", "year", "all")

  /** Default cap for raw-data passthrough per feature (reference: flows/data_pipeline.py:931). */
  val DefaultRawCountThreshold = 10000
}
