package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt compliance filtering — the legality gate a crawl-derived
  * corpus runs before anything else: pages whose host's robots.txt
  * disallows the path for the pipeline's user agent are dropped (or
  * flagged) BEFORE text ever enters curation.
  *
  * Semantics implemented (the core Robots Exclusion Protocol,
  * RFC 9309): group selection uses crawler-name matching — a group
  * applies when its `User-agent` token is a case-insensitive PREFIX of
  * the crawler's product token (so `graftbot` captures
  * `graftbot-news/1.0` but a generic `bot` group does NOT capture
  * `graftbot`); the longest matching token wins over the `*` group,
  * which is the fallback. Within the chosen group, the rule whose path
  * prefix is
  * the LONGEST match decides, an `Allow`/`Disallow` tie at equal length
  * resolves to Allow, and a path matching no rule is allowed. An empty
  * `Disallow:` value allows everything (the classic idiom). Wildcard
  * (`*`, `$`) path extensions are out of scope — prefix rules are the
  * RFC core and what the oracle mirrors; a site using wildcards parses
  * to its literal-prefix subset. Unparseable content (a 404 HTML page
  * where robots.txt should be) yields NO rules = allow-all, the web
  * default.
  *
  * Scale shape: the robots table is host-cardinality (millions of
  * rows), the page table is corpus-cardinality (billions) — so robots
  * BROADCASTS and pages never shuffle: the decision is evaluated in a
  * `mapPartitions` over the broadcast-joined rows with a per-partition
  * parsed-rules cache keyed by host (the broadcast side is deduped to
  * one robots text per host, and hosts repeat heavily within a
  * partition), so each distinct robots.txt parses once per task, not
  * once per page. */
object Robots {

  /** One path rule: `allow` with its path prefix. */
  final case class Rule(allow: Boolean, prefix: String)

  /** One parsed robots group: its (lowercased) agent tokens, path rules
    * in file order, and the group's Crawl-delay if it declared a
    * numeric one. */
  private final case class Group(
      agents: List[String], rules: List[Rule], delay: Option[Double])

  /** The raw group structure of a robots.txt: consecutive User-agent
    * lines open a group; Allow/Disallow/Crawl-delay lines fill it. */
  private def parseGroups(txt: String): List[Group] = {
    var groups = List.empty[Group] // reversed; rules reversed within
    var curAgents = List.empty[String]
    var curRules = List.empty[Rule]
    var curDelay = Option.empty[Double]
    var inAgents = false
    def flush(): Unit =
      if (curAgents.nonEmpty) groups = Group(curAgents, curRules, curDelay) :: groups
    txt.split("\n").foreach { line0 =>
      val line = line0.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) { flush(); curAgents = Nil; curRules = Nil; curDelay = None }
            curAgents ::= value.toLowerCase(java.util.Locale.ROOT)
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            // an empty Disallow allows everything: no rule
            if (value.nonEmpty)
              curRules ::= Rule(allow = key == "allow", prefix = value)
          case "crawl-delay" =>
            inAgents = false
            // non-numeric values are ignored like any other garbage line;
            // duplicate declarations WITHIN a group take the conservative
            // max, same as the cross-group tie rule — RFC 9309 merges
            // repeated groups, so the two layouts must decide identically
            value.toDoubleOption.filter(d => d >= 0 && !d.isInfinite)
              .foreach(d => curDelay = Some(curDelay.fold(d)(math.max(_, d))))
          case _ => inAgents = false // sitemap, host, ... ignored
        }
      }
    }
    flush()
    groups.reverse.map(g => g.copy(rules = g.rules.reverse))
  }

  /** The groups matching `agent`, best agent-match length only: the
    * longest token that PREFIXES our agent wins (RFC 9309 crawler-name
    * match — a substring match would let a generic 'bot' group capture
    * 'graftbot' and outrank '*'); '*' = fallback at length 0. ALL
    * groups at the winning length are returned — RFC 9309 requires
    * combining the rules of every matching group (two 'User-agent: *'
    * blocks are one logical group), and dropping one would under-block
    * on a compliance gate. */
  private def matchingGroups(txt: String, agent: String): Seq[Group] = {
    if (txt == null) return Nil
    val la = agent.toLowerCase(java.util.Locale.ROOT)
    val candidates = parseGroups(txt).flatMap { g =>
      g.agents.collect {
        case a if a != "*" && la.startsWith(a) => (a.length, g)
        case a if a == "*" => (0, g)
      }
    }
    if (candidates.isEmpty) Nil
    else {
      val best = candidates.map(_._1).max
      candidates.filter(_._1 == best).map(_._2)
    }
  }

  /** Parse robots.txt for `agent`: the rules of the best-matching group
    * — the group whose User-agent token is the longest case-insensitive
    * PREFIX of `agent` (RFC 9309 crawler-name matching), falling back
    * to the `*` group. */
  def parseRobots(txt: String, agent: String): Seq[Rule] =
    matchingGroups(txt, agent).flatMap(_.rules).toList

  /** The Crawl-delay (seconds) the best-matching group declares for
    * `agent`, None when it declares none (callers apply their own
    * politeness default). Crawl-delay is a de-facto extension (not in
    * RFC 9309) that real crawl pipelines respect; group selection is
    * the SAME crawler-name matching as [[parseRobots]], so an
    * `evilbot` group's punitive delay never leaks onto `graftbot`.
    * When several groups tie at the winning match length, the most
    * conservative (maximum) declared delay wins — deterministic and
    * compliance-safe. Feed the result into
    * [[graft.operators.Frontier.scheduleWithDelays]]. */
  def crawlDelaySeconds(txt: String, agent: String): Option[Double] = {
    val declared = matchingGroups(txt, agent).flatMap(_.delay)
    if (declared.isEmpty) None else Some(declared.max)
  }

  /** RFC 9309 decision: longest matching prefix wins, Allow wins length
    * ties, no match = allowed. */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (path.startsWith(r.prefix)) {
        if (r.prefix.length > bestLen ||
          (r.prefix.length == bestLen && r.allow)) {
          bestLen = r.prefix.length
          bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** URL path (+ "/" default) — the portion robots rules match against. */
  private def pathOf(url: String): String = {
    val schemeEnd = url.indexOf("://")
    val from = if (schemeEnd >= 0) schemeEnd + 3 else 0
    val slash = url.indexOf('/', from)
    if (slash < 0) "/" else url.substring(slash)
  }

  /** Pages (`idCol`, `urlCol`) joined against `robots` — which MUST
    * carry the columns `(host, robots_txt)` — and decided for `agent`:
    * (id, url, allowed). The robots side is deduplicated to one row per
    * host (lexicographic MIN text wins — repeated runs over the same
    * dirty snapshot always decide identically; a partition-order
    * "first wins" would be too weak a contract for a legality gate)
    * and then broadcasts; pages with no robots row are
    * allowed (no robots.txt = no restrictions). Without the dedup, a
    * host with two robots rows would both DUPLICATE every page row of
    * that host through the left join and apply whichever text a task's
    * cache saw first — order-dependent compliance decisions. The dedup
    * shuffle is on the host-cardinality robots table only; the corpus
    * side still never shuffles. `hostExpr` must produce the page's host
    * in the same normalization as `robots.host`. The per-task rule
    * cache is keyed by HOST (now provably one txt per host), so its
    * footprint is parsed rules only — never the (potentially 100s-of-KB)
    * robots text duplicated per distinct host. */
  def filterByRobots(
      pages: DataFrame,
      robots: DataFrame,
      idCol: String,
      urlCol: String,
      hostExpr: Column,
      agent: String
  ): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val joined = pages
      .select(col(idCol).cast("long").as("id"), col(urlCol).as("url"),
        hostExpr.as("_host"))
      .join(broadcast(robots.select(col("host").as("_host"),
        col("robots_txt").as("_txt"))
        .groupBy("_host").agg(min("_txt").as("_txt"))),
        Seq("_host"), "left")
      .select(col("id"), col("url"), col("_host"), col("_txt"))
      .as[(Long, String, String, String)]
    joined.mapPartitions { it =>
      // per-task parse cache: hosts repeat, each robots.txt parses once
      val cache = scala.collection.mutable.HashMap.empty[String, Seq[Rule]]
      it.map { case (id, url, host, txt) =>
        val allowed =
          if (txt == null) true
          else isAllowed(
            cache.getOrElseUpdate(host, parseRobots(txt, agent)),
            pathOf(url))
        (id, url, allowed)
      }
    }.toDF("id", "url", "allowed")
  }

  /** All `Sitemap:` URLs a robots.txt declares, in file order,
    * deduplicated. Sitemap is NOT group-scoped — sitemaps.org (and
    * RFC 9309's treatment of unknown records) makes each declaration an
    * independent, user-agent-free record, so extraction ignores the
    * surrounding `User-agent` groups entirely (a `Sitemap:` line between
    * an evilbot group and the `*` group still counts). Values are taken
    * verbatim after trimming (the protocol requires absolute URLs;
    * validating/canonicalizing them is the frontier's URL-normalizer's
    * job, not the parser's). Unparseable/absent robots → no sitemaps. */
  def sitemapUrls(txt: String): Seq[String] = {
    if (txt == null) return Nil
    txt.split("\n").toSeq.flatMap { line0 =>
      val line = line0.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim
            .toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }.distinct
  }

  /** Per-host sitemap discovery table: `(host, sitemap_url)` from each
    * host's robots.txt `Sitemap:` declarations — the missing link
    * between the politeness surface and [[graft.sources.Sitemaps]]
    * parsing (robots points at sitemaps; sitemaps enumerate the URLs;
    * [[Frontier]] schedules them). Hosts declaring none are omitted.
    * Same host-cardinality shape and deterministic min-text dedup as
    * [[crawlDelays]], so the result is broadcast-sized discovery
    * metadata at any corpus scale. */
  def sitemapDeclarations(robots: DataFrame): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col("host").as("_host"), col("robots_txt").as("_txt"))
      .groupBy("_host").agg(min("_txt").as("_txt"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (host, txt) =>
        sitemapUrls(txt).map(u => (host, u))
      })
      .toDF("host", "sitemap_url")
  }

  /** Per-host Crawl-delay table for `agent`: `(host, crawl_delay_sec)`,
    * hosts whose robots.txt declares none omitted (join with a left +
    * coalesce to apply a politeness default). The input is
    * host-cardinality — the same deterministic min-text dedup as
    * [[filterByRobots]], then a plain per-row parse; the result is the
    * natural broadcast side of a [[Frontier.scheduleWithDelays]] join. */
  def crawlDelays(robots: DataFrame, agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col("host").as("_host"), col("robots_txt").as("_txt"))
      .groupBy("_host").agg(min("_txt").as("_txt"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (host, txt) =>
        crawlDelaySeconds(txt, agent).map(d => (host, d))
      })
      .toDF("host", "crawl_delay_sec")
  }
}
