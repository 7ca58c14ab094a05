package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{GroupSink, Json, Writer}
import graft.model.Schema
import graft.operators.{Qualifiers, Regions, Spatial, Temporal, TileMath, Validate}
import graft.sources.Ingest
import graft.tiles.Tiling

/** Pipeline parameters (reference flow parameters,
  * flows/data_pipeline.py:927-962).
  *
  * `qualifierMap` (feature -> qualifier columns to break down by) follows
  * reference semantics: when EMPTY, no qualifier breakdowns are produced
  * (flows/common.py:342 gates on `feature in qualifier_map`); qualifier
  * value-list/count metadata is still written for every qualifier column. */
final case class PipelineConfig(
    modelId: String,
    runId: String,
    dataPaths: Seq[String],
    isIndicator: Boolean = false,
    rawCountThreshold: Long = Schema.DefaultRawCountThreshold,
    fillTimestamp: Long = 0L,
    weightColumn: String = "",
    qualifierMap: Map[String, Seq[String]] = Map.empty,
    thresholds: Qualifiers.Thresholds = Qualifiers.Thresholds(),
    selectedOutputTasks: Seq[String] = Seq.empty, // empty => run everything
    destType: String = "file",
    modelBucket: String = "models",
    indicatorBucket: String = "indicators",
    // fs.s3a.* Hadoop overrides for destType = "s3" (endpoint, path-style
    // access, credentials provider — doc/S3_WRITER.md documents the
    // contract); carried as data into the executor-side writer
    s3Conf: Map[String, String] = Map.empty
)

object OutputTask {
  val GlobalTimeseries = "compute_global_timeseries"
  val RegionalStats = "compute_regional_stats"
  val RegionalTimeseries = "compute_regional_timeseries"
  val RegionalAggregation = "compute_regional_aggregation"
  val ComputeTiles = "compute_tiles"
  val RecordResults = "record_results"
  val All: Seq[String] =
    Seq(GlobalTimeseries, RegionalStats, RegionalTimeseries, RegionalAggregation, ComputeTiles)
}

/** Skip matrix + chain gating (reference `configure_pipeline`,
  * flows/data_pipeline.py:245-288). */
final case class PipelineDecisions(
    bucket: String,
    computeMonthly: Boolean,
    computeAnnual: Boolean,
    computeSummary: Boolean,
    skipped: Map[String, Boolean]
) {
  def runs(task: String): Boolean = !skipped.getOrElse(task, false)
}

final case class PipelineResult(
    numRows: Long,
    rowsPerFeature: Map[String, Long],
    features: Seq[String],
    regionColumns: Seq[String],
    objectsWritten: Long
)

object Pipeline {

  def configurePipeline(columns: Seq[String], cfg: PipelineConfig): PipelineDecisions = {
    val hasLatLng = Seq("lat", "lng").forall(columns.contains)
    val bucket = if (cfg.isIndicator) cfg.indicatorBucket else cfg.modelBucket
    val computeSummary = !cfg.isIndicator
    val selected = cfg.selectedOutputTasks
    val recordResults = selected.isEmpty || selected.toSet == OutputTask.All.toSet
    val base = OutputTask.All.map { t =>
      t -> (selected.nonEmpty && !selected.contains(t))
    }.toMap
    val skipped = base +
      (OutputTask.ComputeTiles -> (base(OutputTask.ComputeTiles) || !hasLatLng)) +
      (OutputTask.RecordResults -> !recordResults)
    PipelineDecisions(bucket, computeMonthly = true, computeAnnual = true,
      computeSummary = computeSummary, skipped = skipped)
  }

  /** End-to-end run: ingest → validate → configure → metadata artifacts →
    * monthly chain → annual chain → summary → results.json. Chains run
    * SEQUENTIALLY (the reference gates annual on monthly completion to
    * bound cluster memory, flows/data_pipeline.py:1063-1069); the validated
    * frame and each temporal cube are cached at the reference's persist
    * points and unpersisted when their chain ends. */
  def run(spark: SparkSession, cfg: PipelineConfig): PipelineResult = {
    val raw = Ingest.readData(spark, cfg.dataPaths)
    val vr = Validate(raw, cfg.weightColumn, cfg.fillTimestamp)
    val df = vr.df.cache()
    val numRows = df.count()

    val decisions = configurePipeline(df.columns.toSeq, cfg)
    val writer = Writer.forDest(cfg.destType, decisions.bucket, cfg.s3Conf)
    var objects = 0L

    val qualifierCols = Validate.qualifierColumns(df, vr.weightColumn)
    val regionCols = Regions.extractRegionColumns(df)
    val features: Seq[String] =
      df.select("feature").distinct().collect().map(_.getString(0)).sorted.toSeq
    // Reference semantics: an empty qualifier_map produces NO qualifier
    // breakdowns (flows/common.py:342 gates on `feature in qualifier_map`).
    val requestedQualifierMap: Map[String, Seq[String]] = cfg.qualifierMap

    // ---- raw data + per-feature counts (A13) ------------------------------
    val rowsPerFeature: Map[String, Long] =
      df.groupBy("feature").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val smallFeatures = rowsPerFeature.filter(_._2 <= cfg.rawCountThreshold).keySet
    if (smallFeatures.nonEmpty) {
      val rawCols = df.columns.filterNot(_ == "feature").toSeq
      val rawIdx = rawCols.map(df.schema.fieldIndex)
      objects += GroupSink.writeGroups(
        df.filter(col("feature").isin(smallFeatures.toSeq: _*)),
        keyCols = Seq("feature"), sortCols = Seq("timestamp"),
        render = (key, rows) => (
          s"${cfg.modelId}/${cfg.runId}/raw/${key.getString(key.fieldIndex("feature"))}/raw/raw.csv",
          GroupSink.renderCsv(rawCols, rawIdx, rows)),
        writer = writer)
    }

    // ---- region lists + qualifier lists (A14/A15) -------------------------
    objects += writeRegionLists(df, regionCols, features, cfg, writer)
    val qualifierCounts = writeQualifierLists(df, qualifierCols, features, cfg, writer)
    if (qualifierCols.nonEmpty) objects += features.size.toLong * (qualifierCols.size + 1)

    // max_count pruning runs once, before ALL output tasks
    // (reference: flows/data_pipeline.py:995-996) — bounds every downstream
    // breakdown (and the driver-side pivot collect) by thresholds.maxCount.
    val (qualifierMap, prunedQualifierCols) = Qualifiers.applyQualifierCountLimit(
      requestedQualifierMap, qualifierCols, qualifierCounts, cfg.thresholds.maxCount)

    // ---- monthly + annual chains ------------------------------------------
    var monthTsSize: Map[String, Long] = Map.empty
    var yearTsSize: Map[String, Long] = Map.empty
    for (timeRes <- Seq("month", "year")
         if (timeRes == "month" && decisions.computeMonthly) ||
           (timeRes == "year" && decisions.computeAnnual)) {
      val t = Temporal.aggregate(df, timeRes, vr.weightColumn).cache()
      try {
        if (decisions.runs(OutputTask.GlobalTimeseries)) {
          val (written, tsSize) =
            globalTimeseries(t, prunedQualifierCols, qualifierMap, vr.weightColumn, cfg, timeRes, writer)
          objects += written
          if (timeRes == "month") monthTsSize = tsSize else yearTsSize = tsSize
        }
        if (decisions.runs(OutputTask.RegionalStats))
          objects += regionalStats(t, regionCols, vr.weightColumn, cfg, timeRes, writer)
        if (decisions.runs(OutputTask.RegionalTimeseries))
          objects += regionalTimeseries(t, regionCols, prunedQualifierCols, qualifierMap,
            qualifierCounts, vr.weightColumn, cfg, timeRes, writer)
        if (decisions.runs(OutputTask.RegionalAggregation))
          objects += regionalAggregation(t, regionCols, prunedQualifierCols, qualifierMap,
            vr.weightColumn, cfg, timeRes, writer)
        if (decisions.runs(OutputTask.ComputeTiles)) {
          // A8: weight forcibly disabled — the tile proto has no wavg
          val subtiles = subtileAgg(t).cache()
          try {
            objects += gridStats(subtiles, cfg, timeRes, writer)
            objects += Tiling.saveTiles(
              Tiling.encodeTiles(Tiling.binsPyramid(subtiles)),
              writer, cfg.modelId, cfg.runId, timeRes)
          } finally subtiles.unpersist()
        }
      } finally t.unpersist()
    }

    // ---- summary + results.json -------------------------------------------
    val summaryValues: Option[Json.JValue] =
      if (decisions.computeSummary) Some(outputSummary(df, vr.weightColumn)) else None

    if (decisions.runs(OutputTask.RecordResults)) {
      val results = recordResultsJson(
        numRows = numRows, rowsPerFeature = rowsPerFeature,
        numMissingTs = vr.numMissingTs, numInvalidTs = vr.numInvalidTs,
        numMissingVal = vr.numMissingVal, regionColumns = regionCols,
        features = features, rawCountThreshold = cfg.rawCountThreshold,
        computeTiles = decisions.runs(OutputTask.ComputeTiles),
        computeMonthly = decisions.computeMonthly,
        computeAnnual = decisions.computeAnnual,
        hasWeights = vr.weightColumn.nonEmpty,
        monthTsSize = Some(monthTsSize), yearTsSize = Some(yearTsSize),
        summaryValues = summaryValues)
      writer.write(results, s"${cfg.modelId}/${cfg.runId}/results/results.json")
      objects += 1
    }
    df.unpersist()
    PipelineResult(numRows, rowsPerFeature, features, regionCols, objects)
  }

  // ---- stage implementations ----------------------------------------------

  /** A12/record_results: the results.json payload, field-for-field identical
    * to the reference's `record_results` dict (flows/data_pipeline.py:726-750;
    * goldens tests/unit/test_record_results.py:70-158). "grid data" is
    * appended to region_levels when tiles were computed, and the timeseries
    * size maps appear only when their chain ran AND produced sizes. */
  private[graft] def recordResultsJson(
      numRows: Long, rowsPerFeature: Map[String, Long],
      numMissingTs: Long, numInvalidTs: Long, numMissingVal: Long,
      regionColumns: Seq[String], features: Seq[String],
      rawCountThreshold: Long, computeTiles: Boolean,
      computeMonthly: Boolean, computeAnnual: Boolean, hasWeights: Boolean,
      monthTsSize: Option[Map[String, Long]],
      yearTsSize: Option[Map[String, Long]],
      summaryValues: Option[Json.JValue]): String = {
    val regionLevelsOut =
      regionColumns ++ (if (computeTiles) Seq("grid data") else Nil)
    val dataInfo = Seq(
      "num_rows" -> Json.JLong(numRows),
      "num_rows_per_feature" -> Json.of(rowsPerFeature),
      "num_missing_ts" -> Json.JLong(numMissingTs),
      "num_invalid_ts" -> Json.JLong(numInvalidTs),
      "num_missing_val" -> Json.JLong(numMissingVal),
      "region_levels" -> Json.of(regionLevelsOut),
      "features" -> Json.of(features),
      "raw_count_threshold" -> Json.JLong(rawCountThreshold),
      "has_tiles" -> Json.JBool(computeTiles),
      "has_monthly" -> Json.JBool(computeMonthly),
      "has_annual" -> Json.JBool(computeAnnual),
      "has_weights" -> Json.JBool(hasWeights)
    ) ++
      (if (computeMonthly) monthTsSize.map("month_timeseries_size" -> Json.of(_)) else None) ++
      (if (computeAnnual) yearTsSize.map("year_timeseries_size" -> Json.of(_)) else None)
    Json.JObj(
      Seq("data_info" -> Json.JObj(dataInfo)) ++
        summaryValues.map("output_agg_values" -> _)).render
  }

  /** A4: global timeseries — default + one breakdown per qualifier. */
  private[graft] def globalTimeseries(
      t: DataFrame, qualifierCols: Seq[String], qualifierMap: Map[String, Seq[String]],
      weightCol: String, cfg: PipelineConfig, timeRes: String, writer: Writer
  ): (Long, Map[String, Long]) = {
    var written = 0L
    // default: one global.csv per feature
    val (agg, aggCols) = Spatial.aggregate(t, Seq("feature", "timestamp"), Seq("sum", "mean"), weightCol)
    val header = "timestamp" +: aggCols
    val idx = header.map(agg.schema.fieldIndex)
    written += GroupSink.writeGroups(agg, Seq("feature"), Seq("timestamp"),
      (key, rows) => (
        s"${cfg.modelId}/${cfg.runId}/$timeRes/${key.getString(key.fieldIndex("feature"))}/timeseries/global/global.csv",
        GroupSink.renderCsv(header, idx, rows)),
      writer)
    val tsSize: Map[String, Long] =
      agg.groupBy("feature").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // per qualifier: one wide CSV per (feature, agg column)
    for (q <- qualifierCols) {
      val featuresWithQ = qualifierMap.collect { case (f, qs) if qs.contains(q) => f }.toSeq
      if (featuresWithQ.nonEmpty) {
        val (qagg, qaggCols) =
          Spatial.aggregate(t, Seq("feature", "timestamp", q), Seq("sum", "mean"), weightCol)
        val qaggF = qagg.filter(col("feature").isin(featuresWithQ: _*)).cache()
        try {
          val qValues = qaggF.select(q).distinct().collect().map(_.getString(0)).sorted.toSeq
          for (aggCol <- qaggCols) {
            val wide = qaggF.groupBy("feature", "timestamp")
              .pivot(q, qValues).agg(first(col(aggCol)))
            val wideHeader = "timestamp" +: qValues
            val wideIdx = wideHeader.map(wide.schema.fieldIndex)
            written += GroupSink.writeGroups(wide, Seq("feature"), Seq("timestamp"),
              (key, rows) => (
                s"${cfg.modelId}/${cfg.runId}/$timeRes/${key.getString(key.fieldIndex("feature"))}/timeseries/qualifiers/$q/$aggCol.csv",
                GroupSink.renderCsv(wideHeader, wideIdx, rows)),
              writer)
          }
        } finally qaggF.unpersist()
      }
    }
    (written, tsSize)
  }

  /** A5/A11: regional stats with top-20-capped extrema JSON, ALL admin
    * levels in one grouping-sets shuffle (SURVEY §2.3's flagged idiomatic
    * win over the reference's per-level loop). Scale-safe plan: per-(level,
    * feature) min/max via agg + broadcast join back (no window over a
    * low-cardinality feature key). */
  private[graft] def regionalStats(
      t: DataFrame, regionCols: Seq[String], weightCol: String,
      cfg: PipelineConfig, timeRes: String, writer: Writer
  ): Long = {
    if (regionCols.isEmpty) return 0L // no admin hierarchy -> no regional outputs
    var written = 0L
    val (agg0, aggCols0) = Spatial.aggregateLevels(t, Seq("feature", "timestamp"),
      regionCols, regionCols.indices, Seq("sum", "mean"), weightCol)
    val aggCols = aggCols0.filterNot(_ == "s_count")
    val agg = agg0.drop("s_count").cache()
    try {
      val minmax = agg.groupBy("level", "feature").agg(
        aggCols.flatMap(c => Seq(min(c).as(s"mn_$c"), max(c).as(s"mx_$c"))).head,
        aggCols.flatMap(c => Seq(min(c).as(s"mn_$c"), max(c).as(s"mx_$c"))).tail: _*)
      val marked = agg.join(broadcast(minmax), Seq("level", "feature"))
      // one slim frame of candidate extrema rows across all agg columns,
      // produced in a SINGLE pass over `marked`: each row explodes into
      // its (agg_col, kind, value) extrema hits (usually zero) instead of
      // 2×|aggCols| filtered union branches re-scanning the aggregate
      val entryType = "array<struct<agg_col:string,kind:string,value:double>>"
      val hits = aggCols.flatMap { c =>
        Seq(
          when(col(c) === col(s"mn_$c"),
            array(struct(lit(c).as("agg_col"), lit("min").as("kind"), col(c).as("value"))))
            .otherwise(expr(s"CAST(array() AS $entryType)")).cast(entryType),
          when(col(c) === col(s"mx_$c"),
            array(struct(lit(c).as("agg_col"), lit("max").as("kind"), col(c).as("value"))))
            .otherwise(expr(s"CAST(array() AS $entryType)")).cast(entryType))
      }
      val extrema = marked
        .withColumn("hit", explode(concat(hits: _*)))
        .select(col("level"), col("feature"), col("hit.agg_col").as("agg_col"),
          col("hit.kind").as("kind"),
          col("region_id"), col("timestamp"), col("hit.value").as("value"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("level", "feature", "agg_col", "kind")
            .orderBy(col("timestamp").desc, col("region_id"))))
        .filter(col("rn") <= 20) // reference nlargest(20, timestamp)
      written += GroupSink.writeGroups(extrema,
        Seq("level", "feature"), Seq("agg_col", "kind", "rn"),
        (key, rows) => {
          val level = key.getInt(key.fieldIndex("level"))
          val feature = key.getString(key.fieldIndex("feature"))
          val grouped = rows.toSeq.groupBy(r =>
            (r.getString(r.fieldIndex("kind")), r.getString(r.fieldIndex("agg_col"))))
          def entries(kind: String) = Json.JObj(aggCols.map { c =>
            c -> Json.JArr(grouped.getOrElse((kind, c), Seq.empty).map(r => Json.JObj(Seq(
              "region_id" -> Json.JStr(r.getString(r.fieldIndex("region_id"))),
              "timestamp" -> Json.JLong(r.getLong(r.fieldIndex("timestamp"))),
              "value" -> Json.JDouble(r.getDouble(r.fieldIndex("value")))))))
          })
          val body = Json.JObj(Seq("min" -> entries("min"), "max" -> entries("max"))).render
          (s"${cfg.modelId}/${cfg.runId}/$timeRes/$feature/regional/${regionCols(level)}/stats/default/extrema.json",
            body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        },
        writer)
    } finally agg.unpersist()
    written
  }

  /** A6: one timeseries CSV per (feature, region, qualifier value). */
  private[graft] def regionalTimeseries(
      t: DataFrame, regionCols: Seq[String], qualifierCols: Seq[String],
      qualifierMap: Map[String, Seq[String]], qualifierCounts: Map[String, Map[String, Long]],
      weightCol: String, cfg: PipelineConfig, timeRes: String, writer: Writer
  ): Long = {
    var written = 0L
    val (prunedMap, prunedCols) = Qualifiers.applyQualifierCountLimit(
      qualifierMap, qualifierCols, qualifierCounts, cfg.thresholds.regionalTimeseriesCount)
    // one grouping-sets pass per qualifier option covers every admin level
    // it applies to (qualifier breakdowns are suppressed above
    // regionalTimeseriesMaxLevel) — levels × quals passes become 1 + quals
    for (qualOpt <- (prunedCols.map(Some(_)) :+ None)) {
      val levels = qualOpt match {
        case Some(q) => regionCols.indices.filter(l =>
          Qualifiers.qualifiersForLevel(l, Seq(q), cfg.thresholds).nonEmpty)
        case None => regionCols.indices
      }
      // features that requested this qualifier (None = default pass, all)
      val featureFilter = qualOpt.map(q =>
        prunedMap.collect { case (f, qs) if qs.contains(q) => f }.toSeq)
      val skip = levels.isEmpty || featureFilter.exists(_.isEmpty)
      if (!skip) {
        val fixed = Seq("feature", "timestamp") ++ qualOpt
        val (agg, aggCols) =
          Spatial.aggregateLevels(t, fixed, regionCols, levels, Seq("sum", "mean"), weightCol)
        val frame = featureFilter match {
          case Some(fs) => agg.filter(col("feature").isin(fs: _*))
          case None => agg
        }
        val header = "timestamp" +: aggCols
        val idx = header.map(frame.schema.fieldIndex)
        written += GroupSink.writeGroups(frame,
          Seq("level", "feature", "region_id") ++ qualOpt, Seq("timestamp"),
          (key, rows) => {
            val level = key.getInt(key.fieldIndex("level"))
            val feature = key.getString(key.fieldIndex("feature"))
            val regionId = key.getString(key.fieldIndex("region_id"))
            val sub = qualOpt match {
              case Some(q) => s"qualifiers/$q/${key.getString(key.fieldIndex(q))}"
              case None => "default"
            }
            (s"${cfg.modelId}/${cfg.runId}/$timeRes/$feature/regional/${regionCols(level)}/timeseries/$sub/$regionId.csv",
              GroupSink.renderCsv(header, idx, rows))
          },
          writer)
      }
    }
    written
  }

  /** A7: one regions-list CSV per (feature, timestamp[, qualifier]). */
  private[graft] def regionalAggregation(
      t: DataFrame, regionCols: Seq[String], qualifierCols: Seq[String],
      qualifierMap: Map[String, Seq[String]],
      weightCol: String, cfg: PipelineConfig, timeRes: String, writer: Writer
  ): Long = {
    if (regionCols.isEmpty) return 0L // no admin hierarchy -> no regional outputs
    var written = 0L
    // one grouping-sets pass per qualifier option covers all admin levels:
    // levels × (1 + quals) aggregation shuffles become (1 + quals)
    for (qualOpt <- (None +: qualifierCols.map(Some(_)))) {
      val featureFilter = qualOpt.map(q =>
        qualifierMap.collect { case (f, qs) if qs.contains(q) => f }.toSeq)
      if (!featureFilter.exists(_.isEmpty)) {
        val fixed = Seq("feature", "timestamp") ++ qualOpt
        val (agg, aggCols) = Spatial.aggregateLevels(t, fixed, regionCols,
          regionCols.indices, Seq("sum", "mean"), weightCol)
        val fr = featureFilter match {
          case Some(fs) => agg.filter(col("feature").isin(fs: _*))
          case None => agg
        }
        // the reference's qualifier CSVs carry the column under the literal
        // name "qualifier" (tests/unit/test_compute_regional_aggregation.py)
        val header = qualOpt match {
          case Some(_) => Seq("id", "qualifier") ++ aggCols
          case None => "id" +: aggCols
        }
        val renamed = qualOpt
          .foldLeft(fr.withColumnRenamed("region_id", "id"))(_.withColumnRenamed(_, "qualifier"))
        val idx = header.map(renamed.schema.fieldIndex)
        written += GroupSink.writeGroups(renamed,
          Seq("level", "feature", "timestamp"),
          Seq("id") ++ qualOpt.map(_ => "qualifier"),
          (key, rows) => {
            val level = key.getInt(key.fieldIndex("level"))
            val feature = key.getString(key.fieldIndex("feature"))
            val ts = key.getLong(key.fieldIndex("timestamp"))
            val name = qualOpt.map(q => s"qualifiers/$q").getOrElse("default/default")
            (s"${cfg.modelId}/${cfg.runId}/$timeRes/$feature/regional/${regionCols(level)}/aggs/$ts/$name.csv",
              GroupSink.renderCsv(header, idx, rows))
          },
          writer)
      }
    }
    written
  }

  /** A8: zoom-14 subtile aggregation (weight disabled — proto has no wavg). */
  def subtileAgg(t: DataFrame): DataFrame =
    t.filter(col("lat").isNotNull && col("lng").isNotNull)
      .withColumn("subtile",
        TileMath.deg2num(col("lat"), col("lng"), Schema.MaxSubtilePrecision))
      .groupBy(col("feature"), col("timestamp"),
        col("subtile.z").as("z"), col("subtile.x").as("x"), col("subtile.y").as("y"))
      .agg(
        sum("t_sum").as("s_sum_t_sum"),
        sum("t_mean").as("s_sum_t_mean"),
        count("t_mean").as("s_count"))

  /** A9: zoom-pyramid min/max grid stats → one CSV per (feature, timestamp). */
  private[graft] def gridStats(
      subtiles: DataFrame, cfg: PipelineConfig, timeRes: String, writer: Writer
  ): Long = {
    val pyramid = subtiles
      .withColumn("zoom", explode(expr(s"sequence(${Schema.LevelDiff}, ${Schema.MaxSubtilePrecision})")))
      .withColumn("px", expr(s"shiftright(x, ${Schema.MaxSubtilePrecision} - zoom)"))
      .withColumn("py", expr(s"shiftright(y, ${Schema.MaxSubtilePrecision} - zoom)"))
      .groupBy("feature", "timestamp", "zoom", "px", "py")
      .agg(sum("s_sum_t_sum").as("s_sum_t_sum"),
        sum("s_sum_t_mean").as("s_sum_t_mean"),
        sum("s_count").as("s_count"))
      .withColumn("s_mean_t_sum", col("s_sum_t_sum") / col("s_count"))
      .withColumn("s_mean_t_mean", col("s_sum_t_mean") / col("s_count"))
    val statCols = Seq("s_sum_t_sum", "s_sum_t_mean", "s_mean_t_sum", "s_mean_t_mean")
    val stats = pyramid.groupBy("feature", "timestamp", "zoom").agg(
      statCols.flatMap(c => Seq(min(c).as(s"min_$c"), max(c).as(s"max_$c"))).head,
      statCols.flatMap(c => Seq(min(c).as(s"min_$c"), max(c).as(s"max_$c"))).tail: _*)
    val header = "zoom" +: statCols.flatMap(c => Seq(s"min_$c", s"max_$c"))
    val idx = header.map(stats.schema.fieldIndex)
    GroupSink.writeGroups(stats, Seq("feature", "timestamp"), Seq("zoom"),
      (key, rows) => {
        val feature = key.getString(key.fieldIndex("feature"))
        val ts = key.getLong(key.fieldIndex("timestamp"))
        (s"${cfg.modelId}/${cfg.runId}/$timeRes/$feature/stats/grid/$ts.csv",
          GroupSink.renderCsv(header, idx, rows))
      },
      writer)
  }

  /** A12: output summary values (tiny — collected). */
  private def outputSummary(df: DataFrame, weightCol: String): Json.JValue = {
    val t = Temporal.aggregate(df, "all", weightCol)
    val (agg, aggCols) =
      Spatial.aggregate(t, Seq("feature", "timestamp"), Seq("min", "max", "sum", "mean"), weightCol)
    val cols = aggCols.filterNot(_ == "s_count")
    Json.JArr(agg.drop("s_count").orderBy("feature").collect().toSeq.map { r =>
      Json.JObj(("name" -> Json.JStr(r.getString(r.fieldIndex("feature")))) +:
        cols.map(c => c -> Json.JDouble(r.getDouble(r.fieldIndex(c)))))
    })
  }

  // ---- metadata artifacts -------------------------------------------------

  private[graft] def writeRegionLists(
      df: DataFrame, regionCols: Seq[String], features: Seq[String],
      cfg: PipelineConfig, writer: Writer
  ): Long = {
    if (regionCols.isEmpty) return 0L
    val aggs = regionCols.indices.map(l =>
      sort_array(collect_set(Regions.joinRegionColumns(regionCols, l))).as(s"l$l"))
    val rows = df.groupBy("feature").agg(aggs.head, aggs.tail: _*).collect()
    rows.foreach { r =>
      val feature = r.getString(0)
      val lists = Json.JObj(Schema.RegionLevels.zipWithIndex.map { case (name, l) =>
        name -> (if (l < regionCols.length) Json.of(r.getSeq[String](l + 1)) else Json.JArr(Nil))
      })
      writer.write(lists.render,
        s"${cfg.modelId}/${cfg.runId}/raw/$feature/info/region_lists.json")
    }
    rows.length.toLong
  }

  /** Writes per-qualifier value lists + the counts summary; returns
    * feature -> (qualifier -> distinct count). */
  private[graft] def writeQualifierLists(
      df: DataFrame, qualifierCols: Seq[String], features: Seq[String],
      cfg: PipelineConfig, writer: Writer
  ): Map[String, Map[String, Long]] = {
    if (qualifierCols.isEmpty) return features.map(_ -> Map.empty[String, Long]).toMap
    val aggs = qualifierCols.map(q => sort_array(collect_set(col(q))).as(q))
    val rows = df.groupBy("feature").agg(aggs.head, aggs.tail: _*).collect()
    rows.map { r =>
      val feature = r.getString(0)
      val counts = qualifierCols.zipWithIndex.map { case (q, i) =>
        val values = r.getSeq[String](i + 1)
        writer.write(Json.of(values).render,
          s"${cfg.modelId}/${cfg.runId}/raw/$feature/info/qualifiers/$q.json")
        q -> values.length.toLong
      }.toMap
      writer.write(
        Json.JObj(Seq(
          "thresholds" -> Json.JObj(Seq(
            "max_count" -> Json.JLong(cfg.thresholds.maxCount),
            "regional_timeseries_count" -> Json.JLong(cfg.thresholds.regionalTimeseriesCount),
            "regional_timeseries_max_level" -> Json.JLong(cfg.thresholds.regionalTimeseriesMaxLevel))),
          "counts" -> Json.of(counts))).render,
        s"${cfg.modelId}/${cfg.runId}/raw/$feature/info/qualifier_counts.json")
      feature -> counts
    }.toMap
  }
}
