package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and exact distribution statistics for
  * training-data curation: domain/language mixing needs per-stratum rates
  * that are (a) exactly reproducible across runs, engines and cluster
  * sizes — a training set must be re-derivable bit-for-bit from the raw
  * corpus — and (b) pure per-row decisions, so the sample is a codegen'd
  * filter at scan speed with no shuffle and no RNG state per partition
  * (Spark's `sample()`/`sampleBy()` are seed-stable only for a fixed
  * partitioning, which a 1000-executor re-run does not guarantee).
  */
object Sampling {

  /** The raw 60-bit decision integer behind [[hashUnit]]: the first 15 md5
    * hex digits of `salt:id`. Use THIS for ordering — the scaled double
    * loses 7 bits to the 53-bit mantissa, so two distinct keys can compare
    * equal as doubles while an exact-integer oracle still separates them. */
  def hashKey(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), idCol.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Uniform [0, 1) decision value derived from the row's id: the first 15
    * md5 hex digits (60 bits) of `salt:id` scaled down. Content-addressed —
    * independent of partitioning, ordering, engine. */
  def hashUnit(idCol: Column, salt: String): Column =
    hashKey(idCol, salt).cast("double") / lit(1152921504606846976.0) // 2^60

  /** Keep each row with its stratum's rate: rows where
    * hashUnit(id) < rate(stratum). Strata missing from `rates` get
    * `defaultRate`. Pure projection+filter — no shuffle, no state. */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      salt: String = "graft-sample"
  ): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashUnit(col(idCol), salt) < rate)
  }

  /** Temperature-weighted corpus mixing: re-balances strata (languages,
    * source domains) toward the tempered distribution
    * p'_s ∝ n_s^(1/T) — the standard multilingual-pretraining re-weighting
    * (T=1 keeps natural proportions, T→∞ approaches uniform) — while
    * keeping the total at ~`targetFraction` of the corpus. Each stratum's
    * keep-rate is
    *
    *   rate_s = min(1, targetFraction · N · p'_s / n_s)
    *
    * and the row decision is the same content-addressed [[hashUnit]]
    * threshold as [[stratifiedSample]] — a pure codegen'd filter, exactly
    * reproducible across engines, partitionings and cluster sizes. The
    * stratum statistics are computed in-DAG (tiny per-stratum aggregate,
    * broadcast back onto the scan), so the sample is one corpus pass with
    * no driver-side collect and no shuffle of corpus rows. Oversampled
    * strata cap at 1.0 (sampling without replacement cannot upsample), so
    * the realized total can land under targetFraction when a stratum's
    * tempered share exceeds its size — the standard behavior.
    *
    * Returns the sampled rows with their original columns. */
  def temperatureMix(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      temperature: Double,
      targetFraction: Double,
      salt: String = "graft-mix"
  ): DataFrame = {
    require(temperature > 0.0, "temperature must be positive")
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      "targetFraction must be in (0, 1]")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).cast("double").as("n_s"))
      .withColumn("w", pow(col("n_s"), lit(1.0 / temperature)))
    val totals = counts.agg(sum("n_s").as("n_total"), sum("w").as("w_total"))
    // the rate is rounded to 6 decimals BEFORE the threshold compare: it
    // carries a pow(), and the last-ulp of two engines' pow can differ —
    // thresholding the rounded value keeps the row decision
    // engine-independent (the same convention as the rounded-cosine
    // near-dup filters)
    // collision-proof internal names + the caller frame's own Column
    // references below: a caller column named "rate"/"_stratum" must not
    // turn the join or the final projection ambiguous
    val rates = counts.crossJoin(broadcast(totals))
      .withColumn("__graft_rate", round(least(lit(1.0),
        lit(targetFraction) * col("n_total") * col("w")
          / (col("w_total") * col("n_s"))), 6))
      .select(col(strataCol).as("__graft_stratum"), col("__graft_rate"))
    // null-safe stratum match: a NULL stratum (failed language ID) is a
    // stratum like any other — groupBy already counts it, and an equi-join
    // would silently drop its rows while still deflating everyone's rate
    df.join(broadcast(rates), df(strataCol) <=> rates("__graft_stratum"))
      .filter(hashUnit(df(idCol), salt) < rates("__graft_rate"))
      .select(df.columns.map(df(_)).toIndexedSeq: _*)
  }

  /** Exactly-n-per-stratum deterministic sample — the eval-set carve:
    * within each stratum rows rank by the content-addressed [[hashUnit]]
    * (ties, i.e. hash collisions, break by id) and the first `n` survive.
    * Unlike a rate-based sample the count is exact, and unlike `LIMIT` the
    * choice is content-addressed: re-running on a re-partitioned, re-
    * ordered or incrementally-grown corpus keeps already-chosen rows
    * chosen (a row is displaced only when a new row hashes below it).
    *
    * Two-phase rank (the [[Similarity.bruteForceTopK]] pattern): a
    * per-(stratum, input-partition) pre-rank prunes to n survivors per
    * partition BEFORE the stratum-keyed shuffle, so the final window sorts
    * n × numPartitions rows per stratum, never the stratum itself — the
    * 3-value-stratum 100 TB case stays safe. */
  def takePerStratum(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int,
      salt: String = "graft-take"
  ): DataFrame = {
    require(n > 0, "n must be positive")
    val ord = Seq(hashKey(col(idCol), salt).asc, col(idCol).asc)
    val pre = Window.partitionBy(col(strataCol), spark_partition_id())
      .orderBy(ord: _*)
    val fin = Window.partitionBy(col(strataCol)).orderBy(ord: _*)
    // collision-proof helper names: withColumn REPLACES an existing column
    // of the same name, so a caller frame already carrying "_rn0" would
    // silently lose it — the __graft_ prefix keeps the namespace private
    df
      .withColumn("__graft_rn0", row_number().over(pre))
      .filter(col("__graft_rn0") <= n)
      .withColumn("__graft_rn", row_number().over(fin))
      .filter(col("__graft_rn") <= n)
      .select(df.columns.map(df(_)).toIndexedSeq: _*)
  }

  /** Cluster-balanced (diversity) sample: exactly `nPerCluster` vectors
    * from each spherical-k-means cluster of the embedding corpus —
    * cluster-then-sample, the standard move against a corpus dominated
    * by one dense region (random sampling reproduces the dominance;
    * per-cluster quotas force coverage of the tails). Returns
    * `(idCol, cluster)` for the selected rows.
    *
    * Composition of two existing scale shapes: centroids train on the
    * iteration-bound k-means loop, assignment is a native-argmax
    * PROJECTION off the scan, and the carve is [[takePerStratum]]'s
    * content-addressed two-phase rank — deterministic end to end, so the
    * sample is re-derivable bit-for-bit from the corpus. */
  def clusterBalancedSample(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nPerCluster: Int,
      nClusters: Int = 16,
      kmeansIters: Int = 3
  ): DataFrame = {
    graft.plans.GraftExtensions.register(emb.sparkSession)
    val cent = Similarity.kmeansCentroids(emb, idCol, vecCol, nClusters, kmeansIters)
    val centsLit = typedLit(cent.orderBy("cent_id").collect()
      .map(_.getSeq[Double](1).toSeq).toSeq)
    val assigned = Similarity.spreadToCores(
        emb.select(col(idCol), col(vecCol).cast("array<double>").as("_v")))
      .select(col(idCol),
        call_function("best_centroid", col("_v"), centsLit, lit(true))
          .as("cluster"))
    takePerStratum(assigned, "cluster", idCol, nPerCluster)
  }

  /** Materialize a data recipe with per-stratum epoch weights — the
    * upsampling half of corpus mixing, where a high-value stratum is
    * repeated a FRACTIONAL number of times (w = 2.3 means every row twice
    * plus a 30% chance of a third copy). Each row is emitted
    * `floor(w)` times, plus one more when its content-addressed
    * [[hashUnit]] falls below the fractional part — so expected copies
    * per row are exactly w, the decision is engine/partitioning/
    * rerun-independent, and w < 1 degrades to [[stratifiedSample]]
    * (0 copies or 1). The appended `epoch` column (0-based copy index)
    * gives downstream shuffles a salt to spread the copies with.
    *
    * Scale: a pure projection + per-row explode of at most ceil(w)
    * elements — no shuffle, no state; output volume is Σ_s w_s·n_s by
    * construction, decided row-locally on the scan. */
  def repeatByWeight(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      salt: String = "graft-epoch"
  ): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "epoch weights must be non-negative")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val copies = (floor(w) +
      when(hashUnit(col(idCol), salt) < w - floor(w), lit(1.0))
        .otherwise(lit(0.0))).cast("long")
    df.withColumn("__graft_copies", copies)
      .filter(col("__graft_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__graft_copies") - 1)))
      .drop("__graft_copies")
  }

  /** Group-level (domain-level) quality gate: drop every GROUP whose mean
    * score falls below `minMean`, keep all rows of the surviving groups —
    * the domain-blocklist move of web-corpus curation (a boilerplate farm
    * is recognized by its aggregate, not by any single page, and once
    * recognized the whole domain goes). The mean is rounded to 1e-4
    * before the comparison so the decision is summation-order-free and
    * engine-independent. A NULL group is a group like any other.
    *
    * Scale: one avg aggregation keyed by the group (domain cardinality —
    * partial aggs do the work map-side), then the small failing-group set
    * drives a broadcast-able anti-join: the corpus itself never
    * shuffles. */
  def filterByGroupMean(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      minMean: Double
  ): DataFrame = {
    val bad = df.groupBy(col(groupCol))
      .agg(round(avg(col(scoreCol)), 4).as("__graft_gmean"))
      .filter(col("__graft_gmean") < minMean)
      .select(col(groupCol).as("__graft_bad_group"))
    df.join(bad, df(groupCol) <=> col("__graft_bad_group"), "left_anti")
  }

  /** Deterministic train/validation/test split assignment: each row's
    * content-addressed [[hashUnit]] draw lands in one of the cumulative
    * `splits` intervals ((name, fraction), fractions summing to 1), and
    * the appended `split` column names it. Content-addressed means the
    * assignment survives re-partitioning, re-ordering, re-runs and
    * incremental growth — a row never migrates between splits, the
    * property that keeps eval sets honest as the corpus evolves. Prefer
    * exactly-representable fractions (0.75/0.125/0.125): the interval
    * bounds are then bit-identical on every engine.
    *
    * Scale: a pure projection — the draw and the interval lookup happen
    * row-locally on the scan, no shuffle at any corpus size. */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "graft-split"
  ): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "every split needs a positive fraction")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val uppers = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.init.zip(uppers.init)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), upper), acc) =>
          when(col("__graft_u") < lit(upper), lit(name)).otherwise(acc)
      }
    df.withColumn("__graft_u", hashUnit(col(idCol), salt))
      .withColumn("split", expr)
      .drop("__graft_u")
  }

  /** Exact per-group quantiles of `valueCol` at the given probabilities
    * (linear interpolation, the numpy/DuckDB `quantile_cont` definition).
    * One hash-agg shuffle on the group keys; `percentile` is a sort-based
    * holistic aggregate, so per-group state is O(group row count) — fine
    * for the intended use (per-language / per-domain corpus distributions,
    * thousands of groups), not for million-row groups where the t-digest
    * sketch (`percentile_approx`) is the scale path. */
  def exactQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      probs: Seq[Double],
      names: Seq[String]
  ): DataFrame = {
    require(probs.length == names.length, "one output name per probability")
    val aggs = probs.zip(names).map { case (p, n) =>
      percentile(col(valueCol), lit(p)).as(n)
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Greedy selection under a global cost budget: take documents in
    * (score DESC, id ASC) order while the running cost total stays within
    * `budget` — the "fill the token budget with the best quality first"
    * curation step. Returns (id, score, cost, cum_cost) for the selected
    * rows, where `cum_cost` is the inclusive running total in selection
    * order.
    *
    * The running total over a global order is the classic single-partition
    * window trap (`SUM OVER (ORDER BY ...)` with no PARTITION BY moves the
    * corpus to one task). Instead, a distributed prefix sum:
    *
    *  1. range-repartition + in-partition sort on the selection order —
    *     partition p holds a contiguous rank slice;
    *  2. one tiny pass collects per-partition cost totals (numPartitions
    *     values to the driver), whose exclusive prefix sums are each
    *     partition's starting offset;
    *  3. a per-partition streaming scan (mapPartitions — justified O(1)
    *     imperative state, like Packing) adds the offset and emits rows
    *     until the budget is crossed. Partitions whose offset already
    *     exceeds the budget are skipped WITHOUT scanning — at scale only
    *     the boundary partition does post-offset work.
    *
    * Selection order ties are impossible (id breaks them), so the chosen
    * set is deterministic across engines and partitionings. Costs must be
    * non-negative (a negative cost would make the greedy prefix
    * ill-defined). */
  def selectByBudget(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      costCol: String,
      budget: Long,
      numPartitions: Int = 0
  ): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // eager localCheckpoint, not cache: the offsets pass and the final
    // read MUST see identical partition boundaries, and the range
    // exchange re-samples (reseeded) on every execution — a dropped cache
    // block would silently shift rows across offsets. The checkpoint pins
    // one materialization; its blocks free when the result is GC'd.
    val ranged = df
      .select(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score"),
        col(costCol).cast("long").as("cost"))
      .as[(Long, Double, Long)]
      .repartitionByRange(parts, col("score").desc, col("id").asc)
      .sortWithinPartitions(col("score").desc, col("id").asc)
      .localCheckpoint()
    val totals = ranged.rdd
      .mapPartitionsWithIndex { (p, it) =>
        var s = 0L; it.foreach(s += _._3); Iterator((p, s))
      }
      .collect().toMap
    val offsets = (0 until parts).map { p =>
      p -> (0 until p).map(q => totals.getOrElse(q, 0L)).sum
    }.toMap
    val offsetsB = spark.sparkContext.broadcast(offsets)
    val selected = ranged.rdd.mapPartitionsWithIndex { (p, it) =>
      var run = offsetsB.value(p)
      // skip strictly-past-budget partitions only: at run == budget a
      // leading zero-cost row still satisfies cum <= budget and must be
      // selected (exactly what the SQL running-sum oracle does)
      if (run > budget) Iterator.empty
      else it.map { case (id, score, cost) =>
        run += cost
        (id, score, cost, run)
      }.takeWhile(_._4 <= budget)
    }
    spark.createDataFrame(selected)
      .toDF(idCol, scoreCol, costCol, "cum_cost")
  }

  /** Approximate per-group quantiles via the Greenwald-Khanna sketch
    * (`approx_percentile`) — the 100 TB path: `percentile` materializes
    * and sorts every group's values inside the aggregation buffer, while
    * the sketch is one streaming pass with O(1/accuracy) state per group
    * and mergeable partials (map-side combine works). Rank error is
    * bounded by 1/accuracy of the group size; values are genuine data
    * points (no interpolation), so the result is engine-dependent —
    * verified against [[exactQuantiles]] within tolerance in
    * CurationOpsSpec, rows-only at the driver gate. */
  def approxQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      probs: Seq[Double],
      names: Seq[String],
      accuracy: Int = 10000
  ): DataFrame = {
    require(probs.length == names.length, "one output name per probability")
    val aggs = probs.zip(names).map { case (p, n) =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy)).as(n)
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
