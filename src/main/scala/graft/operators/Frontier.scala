package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier politeness scheduling — the piece between URL
  * discovery (sitemaps, link extraction) and WARC fetching: order each
  * host's candidate URLs by priority and assign fetch offsets honoring
  * a per-host politeness delay (one fetch per `perHostDelaySec` per
  * host — the Mercator-style frontier contract), optionally capping the
  * per-host queue depth. Hosts are independent, so the whole schedule
  * is one host-partitioned computation: cross-host parallelism is free
  * and the frontier scales with the number of hosts, not URLs. */
object Frontier {

  /** Fetch schedule over `(hostCol, urlCol, priorityCol)` rows: the
    * input columns plus `fetch_rank` (1-based position in the host's
    * queue — priority DESC, URL ASC ties, so the schedule is
    * deterministic under any row order) and `scheduled_offset_sec`
    * (`(fetch_rank - 1) * perHostDelaySec` — the earliest polite fetch
    * time relative to the host's first fetch).
    *
    * Determinism contract: `(host, url)` must be UNIQUE — a frontier's
    * natural key, which upstream URL-dedup
    * ([[graft.functions.TextFunctions.canonicalUrl]] + min-id keep)
    * guarantees. Rows duplicating `(host, url, priority)` make the sort
    * key non-total: the (rank, offset) assignment stays deterministic,
    * but WHICH physical duplicate carries each rank is partition-order
    * luck, and the capped pre-prune may keep a different duplicate than
    * the uncapped path would.
    *
    * Scale shape: uncapped, ONE host-keyed window exchange — a true
    * global per-host sort, so callers who keep unbounded queues accept
    * the hot-host skew. With `maxPerHost` set, ranking is TWO-phase
    * (the [[Sampling.takePerStratum]] move): the pre-rank keys on
    * `(host, spark_partition_id)`, so its exchange SPREADS a hot host
    * (one domain holding millions of discovered URLs) across
    * partitions — no single task ever sorts a whole hot host — and the
    * final host exchange then ships only `maxPerHost × partitions`
    * rows per host. Two exchanges, but bounded sort memory at every
    * stage; the cap IS the scale path (real frontiers always bound
    * per-host queue depth). PlanShapeSpec pins both shapes. */
  def schedule(
      urls: DataFrame,
      hostCol: String,
      urlCol: String,
      priorityCol: String,
      perHostDelaySec: Int,
      maxPerHost: Option[Int] = None
  ): DataFrame = {
    require(perHostDelaySec >= 0, "perHostDelaySec must be non-negative")
    ranked(urls, hostCol, urlCol, priorityCol, maxPerHost)
      .withColumn("scheduled_offset_sec",
        (col("fetch_rank") - 1).cast("long") * perHostDelaySec)
  }

  /** [[schedule]] with a PER-HOST politeness delay column (constant
    * within each host — e.g. the robots.txt Crawl-delay surface,
    * [[Robots.crawlDelays]], coalesced with a crawler default):
    * `scheduled_offset_sec = (fetch_rank - 1) * delaySecCol`, double —
    * Crawl-delay values are legitimately fractional. Same ranking
    * shapes as [[schedule]].
    *
    * Null delays are handled HERE, not delegated to every caller: a
    * host missing from the delay frame would otherwise yield
    * `scheduled_offset_sec = null` rows that still carry a
    * `fetch_rank`, and a scheduler consumer ordering by offset gets
    * them in undefined positions. `defaultDelaySec = Some(d)` coalesces
    * the crawler default in-operator; `None` (the default) fails the
    * job loudly on the first null delay instead of propagating it. */
  def scheduleWithDelays(
      urls: DataFrame,
      hostCol: String,
      urlCol: String,
      priorityCol: String,
      delaySecCol: String,
      maxPerHost: Option[Int] = None,
      defaultDelaySec: Option[Double] = None
  ): DataFrame =
    ranked(urls, hostCol, urlCol, priorityCol, maxPerHost)
      .withColumn("scheduled_offset_sec",
        (col("fetch_rank") - 1).cast("double") *
          delayExpr(hostCol, delaySecCol, defaultDelaySec,
            "Frontier.scheduleWithDelays"))

  /** The null-delay policy shared by the delay-aware schedulers (see
    * [[scheduleWithDelays]]' scaladoc): coalesce the crawler default
    * in-operator, or fail loudly naming the host. */
  private def delayExpr(hostCol: String, delaySecCol: String,
      defaultDelaySec: Option[Double], caller: String): Column = {
    defaultDelaySec.foreach(d =>
      require(d >= 0, "defaultDelaySec must be non-negative"))
    defaultDelaySec match {
      case Some(d) => coalesce(col(delaySecCol).cast("double"), lit(d))
      case None =>
        when(col(delaySecCol).isNull, raise_error(concat(
          lit(s"$caller: null delay for host "),
          col(hostCol).cast("string"),
          lit(s" (column '$delaySecCol'); coalesce a crawler default " +
            "upstream or pass defaultDelaySec"))).cast("double"))
          .otherwise(col(delaySecCol).cast("double"))
    }
  }

  /** INCREMENTAL frontier maintenance — the missing piece between
    * one-shot [[schedule]] and a real crawler's standing queue: merge
    * newly `discovered` URLs into a `standing` schedule WITHOUT
    * re-ranking what is already queued. A from-scratch re-rank would
    * reshuffle every queued URL each discovery round AND churn the
    * assigned offsets a fetcher fleet is already executing against;
    * this merge preserves every standing row byte-for-byte (rank/offset
    * CONTINUITY) and appends only the genuinely new `(host, url)` keys
    * after each host's current queue tail.
    *
    * `standing` is a prior [[schedule]]/[[scheduleWithDelays]]/
    * [[mergeSchedule]] output (must carry `fetch_rank` and
    * `scheduled_offset_sec`); `discovered` is a bare
    * `(hostCol, urlCol, priorityCol)` frame, deduped HERE on
    * `(host, url)` keeping the max priority (the same link discovered
    * from many pages is the common crawl case, and appending it twice
    * would break the `(host, url)`-uniqueness invariant [[schedule]]
    * documents and the next merge's anti-join assumes). New keys rank
    * after the host's max standing rank, ordered priority DESC / URL
    * ASC among themselves, offsets continuing the
    * `(fetch_rank - 1) * perHostDelaySec` arithmetic — a host absent
    * from `standing` starts at rank 1 exactly as [[schedule]] would.
    * With `maxPerHost`, appended rows past the merged cap are dropped
    * (standing rows are trusted to respect their own cap — a merge
    * never revokes an already-scheduled fetch).
    *
    * Offset dtype follows the STANDING queue: a fractional queue
    * ([[scheduleWithDelays]] emits double — Crawl-delay is legitimately
    * fractional) merges to double with its offsets preserved exactly
    * and the appended arithmetic carried out in double; an integral
    * queue ([[schedule]]) merges to long. Truncating a fractional
    * standing offset through a long cast would silently collapse
    * politeness slots onto the same instant.
    *
    * DTYPE IS NOT DELAY SEMANTICS: accepting a [[scheduleWithDelays]]
    * standing queue makes the standing OFFSETS survive, but the rows
    * appended here all use this call's single `perHostDelaySec` — a
    * standing queue built with PER-HOST delays must merge through
    * [[mergeScheduleWithDelays]] (with the same delay surface), or
    * every host whose Crawl-delay differs from the constant gets its
    * politeness contract silently rewritten from the append point on.
    * The constant-delay merge over a fractional queue is only correct
    * when the original schedule genuinely used one uniform (fractional
    * or integral) delay.
    *
    * Scale shape: the standing queue is TOUCHED but never re-sorted —
    * one host-cardinality max-rank aggregation (map-side combinable)
    * plus one `(host, url)` anti-join (co-partitionable, zero-shuffle
    * when both sides are stored host-bucketed); the window sort runs
    * over the DISCOVERY DELTA only. Work is delta-proportional, never
    * frontier², the same discipline as [[graft.operators.Dedup]]'s
    * mergeUpsert/corpusDiff incremental family. */
  def mergeSchedule(
      standing: DataFrame,
      discovered: DataFrame,
      hostCol: String,
      urlCol: String,
      priorityCol: String,
      perHostDelaySec: Int,
      maxPerHost: Option[Int] = None
  ): DataFrame = {
    require(perHostDelaySec >= 0, "perHostDelaySec must be non-negative")
    // output offset dtype follows the standing queue (see scaladoc)
    val fractional = {
      import org.apache.spark.sql.types._
      standing.schema("scheduled_offset_sec").dataType match {
        case DoubleType | FloatType | _: DecimalType => true
        case _ => false
      }
    }
    val offT = if (fractional) "double" else "long"
    val fresh = freshRanked(standing, discovered,
        hostCol, urlCol, priorityCol, carryCols = Nil)
      // rank goes long BEFORE the multiply (the schedule() convention):
      // 32-bit rank*delay would silently wrap for deep uncapped queues
      .withColumn("scheduled_offset_sec",
        ((col("fetch_rank") - 1).cast("long") * perHostDelaySec).cast(offT))
    mergedUnion(standing, fresh, hostCol, urlCol, priorityCol,
      offT, maxPerHost)
  }

  /** [[mergeSchedule]] for a PER-HOST-delay queue (the
    * [[scheduleWithDelays]] counterpart): appended rows continue each
    * host's offsets with the HOST'S OWN delay — `delaySecCol` on the
    * `discovered` frame (host-constant, e.g. the same
    * [[Robots.crawlDelays]] join that built the standing queue) — not a
    * global constant, which would break the politeness contract for
    * every host whose Crawl-delay differs. Offsets are double on both
    * sides (standing offsets preserved exactly; integral standing
    * queues upcast losslessly). Null delays follow the
    * [[scheduleWithDelays]] policy: `defaultDelaySec` coalesces, `None`
    * fails loudly. Same delta-proportional shape as [[mergeSchedule]];
    * the delay rides the intra-delta dedup as a `max` aggregate
    * (host-constant, so any combiner is exact). */
  def mergeScheduleWithDelays(
      standing: DataFrame,
      discovered: DataFrame,
      hostCol: String,
      urlCol: String,
      priorityCol: String,
      delaySecCol: String,
      maxPerHost: Option[Int] = None,
      defaultDelaySec: Option[Double] = None
  ): DataFrame = {
    val fresh = freshRanked(standing, discovered,
        hostCol, urlCol, priorityCol, carryCols = Seq(delaySecCol))
      .withColumn("scheduled_offset_sec",
        (col("fetch_rank") - 1).cast("double") *
          delayExpr(hostCol, delaySecCol, defaultDelaySec,
            "Frontier.mergeScheduleWithDelays"))
      .drop(delaySecCol)
    mergedUnion(standing, fresh, hostCol, urlCol, priorityCol,
      "double", maxPerHost)
  }

  /** Shared merge core: intra-delta (host, url) dedup (max priority;
    * `carryCols` ride as max aggregates), anti-join against the
    * standing keys, per-host rank continuation after the standing
    * tail. The window sorts the DELTA only. */
  private def freshRanked(
      standing: DataFrame,
      discovered: DataFrame,
      hostCol: String,
      urlCol: String,
      priorityCol: String,
      carryCols: Seq[String]
  ): DataFrame = {
    val base = standing.groupBy(col(hostCol))
      .agg(max(col("fetch_rank")).as("__graft_base_rank"))
    val aggs = max(col(priorityCol)).as(priorityCol) +:
      carryCols.map(c => max(col(c)).as(c))
    discovered
      .groupBy(col(hostCol), col(urlCol))
      .agg(aggs.head, aggs.tail: _*)
      .join(standing.select(col(hostCol), col(urlCol)),
        Seq(hostCol, urlCol), "left_anti")
      .join(base, Seq(hostCol), "left")
      .withColumn("__graft_rn", row_number().over(
        Window.partitionBy(col(hostCol))
          .orderBy(col(priorityCol).desc, col(urlCol).asc)))
      .withColumn("fetch_rank",
        (coalesce(col("__graft_base_rank"), lit(0)) + col("__graft_rn"))
          .cast("integer"))
      .drop("__graft_base_rank", "__graft_rn")
  }

  private def mergedUnion(
      standing: DataFrame,
      fresh: DataFrame,
      hostCol: String,
      urlCol: String,
      priorityCol: String,
      offT: String,
      maxPerHost: Option[Int]
  ): DataFrame = {
    maxPerHost.foreach(m => require(m > 0, "maxPerHost must be positive"))
    val appended = maxPerHost match {
      case Some(m) => fresh.filter(col("fetch_rank") <= m)
      case None => fresh
    }
    standing.select(col(hostCol), col(urlCol), col(priorityCol),
        col("fetch_rank").cast("integer").as("fetch_rank"),
        col("scheduled_offset_sec").cast(offT).as("scheduled_offset_sec"))
      .unionByName(appended.select(col(hostCol), col(urlCol),
        col(priorityCol), col("fetch_rank"),
        col("scheduled_offset_sec").cast(offT).as("scheduled_offset_sec")))
  }

  private def ranked(
      urls: DataFrame,
      hostCol: String,
      urlCol: String,
      priorityCol: String,
      maxPerHost: Option[Int]
  ): DataFrame = {
    val ord: Seq[Column] = Seq(col(priorityCol).desc, col(urlCol).asc)
    maxPerHost match {
      case Some(m) =>
        require(m > 0, "maxPerHost must be positive")
        val pre = Window.partitionBy(col(hostCol), spark_partition_id())
          .orderBy(ord: _*)
        val fin = Window.partitionBy(col(hostCol)).orderBy(ord: _*)
        urls
          .withColumn("__graft_rn0", row_number().over(pre))
          .filter(col("__graft_rn0") <= m)
          .drop("__graft_rn0")
          .withColumn("fetch_rank", row_number().over(fin))
          .filter(col("fetch_rank") <= m)
      case None =>
        urls.withColumn("fetch_rank",
          row_number().over(Window.partitionBy(col(hostCol)).orderBy(ord: _*)))
    }
  }
}
