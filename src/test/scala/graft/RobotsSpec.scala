package graft

import org.apache.spark.sql.functions._

import graft.operators.Robots
import graft.operators.Robots.Rule

/** RFC 9309 core semantics: group selection, longest-prefix-match
  * decisions, the Allow tie-break, parser tolerance, and the
  * broadcast-join DataFrame face. */
class RobotsSpec extends SparkSpec {

  private val txt =
    """# example robots.txt
      |User-agent: evilbot
      |Disallow: /
      |
      |User-agent: graftbot
      |Disallow: /private
      |Allow: /private/ok
      |
      |User-agent: *
      |Disallow: /all
      |Crawl-delay: 10
      |Sitemap: http://x/s.xml
      |""".stripMargin

  test("group selection: exact agent beats '*', '*' is the fallback") {
    // evilbot gets its deny-all group
    assert(Robots.parseRobots(txt, "evilbot") === Seq(Rule(false, "/")))
    // graftbot gets ITS group, not '*' and not evilbot's
    assert(Robots.parseRobots(txt, "graftbot")
      === Seq(Rule(false, "/private"), Rule(true, "/private/ok")))
    // an agent token that PREFIXES the product token matches (RFC 9309
    // crawler-name match)
    assert(Robots.parseRobots(txt, "graftbot-news/1.0")
      === Seq(Rule(false, "/private"), Rule(true, "/private/ok")))
    // but a generic group token that is merely a SUBSTRING of the agent
    // must NOT capture it — 'bot' does not govern 'graftbot'
    val generic = "User-agent: bot\nDisallow: /\n\nUser-agent: *\nDisallow: /all\n"
    assert(Robots.parseRobots(generic, "graftbot") === Seq(Rule(false, "/all")))
    // anyone else falls back to '*' (directives like Crawl-delay ignored)
    assert(Robots.parseRobots(txt, "otherbot") === Seq(Rule(false, "/all")))
  }

  test("duplicate robots rows: deduped, no page-row fanout") {
    import spark.implicits._
    // two conflicting rows for the same host: the join must still emit
    // exactly one row per page, decided by ONE of the texts
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /no\n"),
      ("a.com", "User-agent: *\nDisallow: /no\n")).toDF("host", "robots_txt")
    val pages = Seq((1L, "http://a.com/no/p"), (2L, "http://a.com/ok"))
      .toDF("doc_id", "url")
    val out = Robots.filterByRobots(pages, robots, "doc_id", "url",
        graft.functions.TextFunctions.urlHost(col("url")), "anybot")
      .collect()
    assert(out.length === 2)
    assert(out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      === Map(1L -> false, 2L -> true))
  }

  test("conflicting robots rows: the lexicographic-min text decides, always") {
    import spark.implicits._
    // a dirty snapshot with two DIFFERENT texts for one host: a legality
    // gate must decide identically on every run, not by partition order.
    // The texts share their first line ("User-agent: *\n"); the deciding
    // comparison is the second line, "Allow" < "Disallow", so the
    // allow-all variant sorts first and wins the min.
    val allowAll = "User-agent: *\nAllow: /\n"
    val denyNo = "User-agent: *\nDisallow: /no\n"
    assert(allowAll < denyNo) // the contract this test pins
    val pages = Seq((1L, "http://a.com/no/p")).toDF("doc_id", "url")
    (1 to 3).foreach { _ =>
      // both input orders, repeated: the decision never flips
      Seq(Seq(("a.com", allowAll), ("a.com", denyNo)),
          Seq(("a.com", denyNo), ("a.com", allowAll))).foreach { rows =>
        val out = Robots.filterByRobots(pages, rows.toDF("host", "robots_txt"),
            "doc_id", "url",
            graft.functions.TextFunctions.urlHost(col("url")), "anybot")
          .collect()
        assert(out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
          === Map(1L -> true))
      }
    }
  }

  test("crawl-delay: group-selected, numeric-only, max on ties, None when absent") {
    import Robots.crawlDelaySeconds
    val txt = "User-agent: evilbot\nCrawl-delay: 99\nDisallow: /\n\n" +
      "User-agent: graftbot\nCrawl-delay: 2.5\n\n" +
      "User-agent: *\nCrawl-delay: 10\n"
    // group selection mirrors parseRobots: the specific group wins, the
    // punitive evilbot 99 and the '*' 10 never leak onto graftbot
    assert(crawlDelaySeconds(txt, "graftbot") === Some(2.5))
    assert(crawlDelaySeconds(txt, "otherbot") === Some(10.0))
    assert(crawlDelaySeconds(txt, "evilbot") === Some(99.0))
    // absent in the winning group -> None even if another group has one
    val noDelay = "User-agent: graftbot\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 10\n"
    assert(crawlDelaySeconds(noDelay, "graftbot") === None)
    // two groups tie at the winning length: the conservative max wins
    val two = "User-agent: *\nCrawl-delay: 3\n\nUser-agent: *\nCrawl-delay: 8\n"
    assert(crawlDelaySeconds(two, "anybot") === Some(8.0))
    // ...and duplicate declarations WITHIN one group decide the same way
    // (RFC 9309 merges repeated groups — the layouts must agree)
    val dupInGroup = "User-agent: *\nCrawl-delay: 9\nCrawl-delay: 2\n"
    assert(crawlDelaySeconds(dupInGroup, "anybot") === Some(9.0))
    // garbage values are ignored like any other malformed line
    assert(crawlDelaySeconds("User-agent: *\nCrawl-delay: fast\n", "x") === None)
    assert(crawlDelaySeconds("User-agent: *\nCrawl-delay: -1\n", "x") === None)
    assert(crawlDelaySeconds(null, "x") === None)
  }

  test("crawlDelays frame: one row per declaring host, deterministic on dups") {
    import spark.implicits._
    val robots = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 4\n"),
      ("b.com", "User-agent: *\nDisallow: /x\n"), // no delay -> omitted
      ("c.com", "User-agent: *\nCrawl-delay: 2\n"),
      ("c.com", "User-agent: *\nCrawl-delay: 9\n")) // dup host: min text wins
      .toDF("host", "robots_txt")
    val out = Robots.crawlDelays(robots, "graftbot").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out === Map("a.com" -> 4.0, "c.com" -> 2.0))
  }

  test("decision: longest prefix wins, Allow wins ties, no rule allows") {
    val rules = Robots.parseRobots(txt, "graftbot")
    assert(!Robots.isAllowed(rules, "/private/x"))
    assert(Robots.isAllowed(rules, "/private/ok/page")) // longer Allow wins
    assert(Robots.isAllowed(rules, "/public"))          // no matching rule
    // equal-length tie resolves to Allow
    val tie = Seq(Rule(false, "/p"), Rule(true, "/p"))
    assert(Robots.isAllowed(tie, "/page"))
    // the deny-all group really denies everything
    assert(!Robots.isAllowed(Robots.parseRobots(txt, "evilbot"), "/"))
  }

  test("all groups at the winning agent-match length MERGE (RFC 9309)") {
    // two separate '*' blocks are ONE logical group — dropping either
    // under-blocks a compliance gate
    val two =
      "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
    val rules = Robots.parseRobots(two, "anybot")
    assert(rules.toSet === Set(Rule(false, "/a"), Rule(false, "/b")))
    assert(!Robots.isAllowed(rules, "/b/page"))
    // merged exact-agent groups too, and they still beat '*'
    val mixed = "User-agent: graftbot\nDisallow: /x\n\n" +
      "User-agent: *\nDisallow: /everything\n\n" +
      "User-agent: graftbot\nDisallow: /y\n"
    val g = Robots.parseRobots(mixed, "graftbot")
    assert(g.toSet === Set(Rule(false, "/x"), Rule(false, "/y")))
    assert(Robots.isAllowed(g, "/everything")) // '*' group not mixed in
  }

  test("parser tolerance: garbage, empty Disallow, missing groups") {
    // a 404 HTML page where robots.txt should be: no rules = allow-all
    assert(Robots.parseRobots("<html>404</html>", "graftbot") === Nil)
    assert(Robots.isAllowed(Nil, "/anything"))
    // the empty-Disallow idiom allows everything (no rule emitted)
    assert(Robots.parseRobots("User-agent: *\nDisallow:\n", "x") === Nil)
    assert(Robots.parseRobots(null, "x") === Nil)
  }

  test("filterByRobots: broadcast decision, missing robots row allows") {
    import spark.implicits._
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /no\nAllow: /no/yes\n"))
      .toDF("host", "robots_txt")
    val pages = Seq(
      (1L, "http://a.com/no/page"),    // denied
      (2L, "http://a.com/no/yes/p"),   // allow override
      (3L, "http://a.com/fine"),       // no matching rule
      (4L, "http://b.com/no/page"),    // no robots row -> allowed
      (5L, "http://a.com")             // bare host -> path "/"
    ).toDF("doc_id", "url")
    val out = Robots.filterByRobots(pages, robots, "doc_id", "url",
        graft.functions.TextFunctions.urlHost(col("url")), "anybot")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> true,
      4L -> true, 5L -> true))
  }

  test("sitemapUrls: group-free extraction, dedup, trimming, tolerance") {
    // Sitemap is not group-scoped: declarations before, between, and
    // inside user-agent groups all count, for every crawler
    val txt =
      "Sitemap: http://a.com/top.xml\n" +
        "User-agent: evilbot\nDisallow: /\n" +
        "Sitemap:   http://a.com/mid.xml  \n" +
        "\nUser-agent: *\nCrawl-delay: 2\n" +
        "sitemap: http://a.com/lower.xml\n" + // key is case-insensitive
        "Sitemap: http://a.com/top.xml\n" +   // duplicate: once
        "Sitemap:\n" +                        // empty value: ignored
        "# Sitemap: http://a.com/comment.xml\n"
    assert(Robots.sitemapUrls(txt) === Seq("http://a.com/top.xml",
      "http://a.com/mid.xml", "http://a.com/lower.xml"))
    // and the group parsing is undisturbed by the interleaved records
    assert(Robots.crawlDelaySeconds(txt, "graftbot") === Some(2.0))
    assert(Robots.sitemapUrls("<html>404</html>") === Nil)
    assert(Robots.sitemapUrls(null) === Nil)
  }

  test("sitemapDeclarations: per-host table, min-text dedup, omission") {
    import spark.implicits._
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /x\nSitemap: http://a.com/s1.xml\nSitemap: http://a.com/s2.xml\n"),
      // duplicate host rows: lexicographic MIN text decides (the
      // filterByRobots/crawlDelays contract) — 'A...' < 'Sitemap...'
      ("b.com", "Sitemap: http://b.com/from-larger.xml\n"),
      ("b.com", "Allow: /\n"),
      ("c.com", "User-agent: *\nDisallow: /\n")) // none declared: omitted
      .toDF("host", "robots_txt")
    val out = Robots.sitemapDeclarations(robots)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(
      ("a.com", "http://a.com/s1.xml"), ("a.com", "http://a.com/s2.xml")))
  }
}
