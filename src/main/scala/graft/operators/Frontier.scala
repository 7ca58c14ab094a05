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
    * shapes as [[schedule]]. */
  def scheduleWithDelays(
      urls: DataFrame,
      hostCol: String,
      urlCol: String,
      priorityCol: String,
      delaySecCol: String,
      maxPerHost: Option[Int] = None
  ): DataFrame =
    ranked(urls, hostCol, urlCol, priorityCol, maxPerHost)
      .withColumn("scheduled_offset_sec",
        (col("fetch_rank") - 1).cast("double") * col(delaySecCol))

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
