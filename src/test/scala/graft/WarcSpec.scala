package graft

import graft.sources.Warc
import graft.sources.Warc.WarcRecord

/** The real WARC parser: build→parse round trips (plain and the
  * Common Crawl one-gzip-member-per-record layout), HTTP body
  * extraction, and the reject-don't-crash contract on corrupt input. */
class WarcSpec extends SparkSpec {

  private def resp(uri: String, body: String): WarcRecord =
    WarcRecord("response", Some(uri), Some("2024-01-01T00:00:00Z"),
      Some("application/http; msgtype=response"),
      ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body)
        .getBytes("UTF-8"))

  private val warcInfo = WarcRecord("warcinfo", None, None,
    Some("application/warc-fields"), "software: graft\r\n".getBytes("UTF-8"))

  test("build -> parseAll round-trips records, plain and gzip-per-record") {
    val recs = Seq(warcInfo, resp("http://a/1", "hello"), resp("http://a/2", "world"))
    for (gz <- Seq(false, true)) {
      val parsed = Warc.parseAll(Warc.build(recs, gzipPerRecord = gz))
      assert(parsed.length === 3, s"gz=$gz")
      assert(parsed.map(_.recordType) === Seq("warcinfo", "response", "response"))
      assert(parsed(1).targetUri === Some("http://a/1"))
      assert(parsed(2).date === Some("2024-01-01T00:00:00Z"))
      assert(parsed.map(_.payload.toSeq) === recs.map(_.payload.toSeq))
    }
  }

  test("payload bytes are sliced by Content-Length, not by delimiters") {
    // a payload CONTAINING the record separator and a fake WARC header
    // must come back intact — only Content-Length decides the boundary
    val tricky = "x\r\n\r\nWARC/1.0\r\ny".getBytes("UTF-8")
    val recs = Seq(WarcRecord("resource", Some("http://t"), None,
      Some("text/plain"), tricky), resp("http://a/after", "still here"))
    val parsed = Warc.parseAll(Warc.build(recs))
    assert(parsed.length === 2)
    assert(parsed(0).payload.toSeq === tricky.toSeq)
    assert(parsed(1).targetUri === Some("http://a/after"))
  }

  test("httpBody extracts after the first blank line; None without one") {
    assert(Warc.httpBody(
      "HTTP/1.1 200 OK\r\nA: b\r\n\r\nthe body".getBytes("UTF-8"))
      .map(new String(_, "UTF-8")) === Some("the body"))
    assert(Warc.httpBody("no terminator here".getBytes("UTF-8")).isEmpty)
    // empty body after a terminator is Some("")
    assert(Warc.httpBody("H: v\r\n\r\n".getBytes("UTF-8"))
      .map(new String(_, "UTF-8")) === Some(""))
  }

  test("corrupt input: not-WARC parses to Nil, truncation keeps the prefix") {
    assert(Warc.parseAll("garbage not warc".getBytes("UTF-8")) === Nil)
    assert(Warc.parseAll(null) === Nil)
    assert(Warc.parseAll(Array[Byte](0x1f.toByte, 0x8b.toByte, 1, 2)) === Nil)
    val two = Warc.build(Seq(resp("http://a/1", "one"), resp("http://a/2", "two")))
    // cut inside the second record's payload: first record survives
    val cut = java.util.Arrays.copyOfRange(two, 0, two.length - 10)
    val parsed = Warc.parseAll(cut)
    assert(parsed.length === 1 && parsed.head.targetUri === Some("http://a/1"))
    // a Content-Length that overruns the stream stops the parse cleanly
    val lied = new String(two, "UTF-8").replaceFirst(
      "Content-Length: \\d+", "Content-Length: 99999").getBytes("UTF-8")
    assert(Warc.parseAll(lied) === Nil)
  }

  test("Sitemaps.entries: urlset + index one-grammar parse, trim, optional lastmod") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val urlset =
      """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url>
        |  <loc>  http://a.com/p1 </loc>
        |  <lastmod>2024-03-01</lastmod>
        |</url>
        |<url><loc>http://a.com/p2</loc></url>
        |<url><lastmod>2024-01-01</lastmod></url>
        |</urlset>""".stripMargin // last block has no loc -> dropped
    val index =
      "<sitemapindex><sitemap><loc>http://a.com/s1.xml</loc></sitemap></sitemapindex>"
    val in = Seq((1L, urlset), (2L, index), (3L, "<html>nope</html>"))
      .toDF("doc_id", "xml")
    val out = graft.sources.Sitemaps.entries(in, "doc_id", "xml")
      .orderBy(col("id"), col("loc")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3))))
    assert(out.toSeq === Seq(
      (1L, "url", "http://a.com/p1", Some("2024-03-01")),
      (1L, "url", "http://a.com/p2", None),
      (2L, "sitemap", "http://a.com/s1.xml", None)))
  }

  test("records() explodes files into the per-record stream with bodies") {
    import spark.implicits._
    val fileA = Warc.build(Seq(warcInfo, resp("http://a/1", "body A")),
      gzipPerRecord = true)
    val in = Seq((1L, fileA), (2L, "not a warc".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Warc.records(in, "doc_id")
      .orderBy("id", "rec_idx").collect()
    assert(out.length === 2) // the corrupt file contributes no rows
    assert(out(0).getString(2) === "warcinfo" && out(0).isNullAt(6))
    assert(out(1).getString(3) === "http://a/1")
    assert(out(1).getString(6) === "body A")
    assert(out(1).getLong(5) === ("HTTP/1.1 200 OK\r\nContent-Type: " +
      "text/plain\r\n\r\nbody A").length.toLong)
  }
}
