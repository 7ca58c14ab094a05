package graft.operators

/** Qualifier-threshold machinery (reference: flows/common.py:218-236,
  * flows/data_pipeline.py:500-512, 862-891): qualifiers whose per-feature
  * distinct-value counts exceed a threshold are pruned from the qualifier
  * map and column list before regional/timeseries breakdowns — driver-side
  * logic over already-collected counts (tiny data).
  */
object Qualifiers {

  /** Thresholds with the reference defaults
    * (flows/data_pipeline.py:945-952). */
  final case class Thresholds(
      maxCount: Int = 10000,
      regionalTimeseriesCount: Int = 100,
      regionalTimeseriesMaxLevel: Int = 1
  )

  /** Prune qualifiers with too many categories.
    *
    * @param qualifierMap  feature -> qualifiers requested for it
    * @param columns       all qualifier columns
    * @param counts        feature -> (qualifier -> distinct-value count)
    * @param maxCount      keep only qualifiers with count <= maxCount
    * @return (pruned map, pruned column list)
    */
  def applyQualifierCountLimit(
      qualifierMap: Map[String, Seq[String]],
      columns: Seq[String],
      counts: Map[String, Map[String, Long]],
      maxCount: Long
  ): (Map[String, Seq[String]], Seq[String]) = {
    val newMap = qualifierMap.flatMap { case (feature, qualifiers) =>
      counts.get(feature).map { countsForFeature =>
        feature -> qualifiers.filter(q =>
          countsForFeature.get(q).exists(_ <= maxCount))
      }
    }
    val smallQualifiers = newMap.values.flatten.toSet
    (newMap, columns.filter(smallQualifiers.contains))
  }

  /** Qualifier columns used at a given admin level for regional timeseries:
    * suppressed entirely above `regionalTimeseriesMaxLevel`
    * (reference: flows/data_pipeline.py:500-512). */
  def qualifiersForLevel(
      level: Int,
      qualifierColumns: Seq[String],
      thresholds: Thresholds
  ): Seq[String] =
    if (level > thresholds.regionalTimeseriesMaxLevel) Seq.empty
    else qualifierColumns
}
