package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Golden fixtures for the HTML extraction family (t48): hand-computed
  * visible text, entity folds, and boilerplate scores. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def textOf(html: String): String =
    Seq(html).toDF("h").select(TextFunctions.htmlText(col("h"))).head.getString(0)

  test("htmlText: tags strip, script/style drop whole, whitespace collapses") {
    val html = "<html><head><style>p { color: red; }</style>" +
      "<script>if (1 < 2) { document.write(\"<b>junk</b>\"); }</script></head>" +
      "<body><h1>Title</h1>\n<p>Hello   <b>big</b>\tworld.</p></body></html>"
    assert(textOf(html) === "Title Hello big world.")
  }

  test("htmlText: comments vanish, entities decode, &amp; decodes last") {
    val html = "<p><!-- secret -->A &lt;tag&gt; &amp; B&nbsp;C &amp;lt; D</p>"
    // "&amp;lt;" must become the literal "&lt;", NOT "<" (single decode)
    assert(textOf(html) === "A <tag> & B C &lt; D")
  }

  test("htmlText: script body with markup-looking strings cannot leak") {
    val html = "<script>var s = \"<p>fake</p>\";</script><p>real</p>"
    assert(textOf(html) === "real")
  }

  test("htmlLinkDensity: anchor text over total text, 4dp") {
    val d = Seq(
      // "Nav One Nav Two" = 15 chars of 26 total ("Nav One Nav Two body prose" minus... )
      "<ul><li><a href=\"/a\">Nav One</a></li><li><a href=\"/b\">Nav Two</a></li></ul><p>body prose</p>",
      "<p>no links at all here</p>")
      .toDF("h").select(TextFunctions.htmlLinkDensity(col("h"))).as[Double].collect()
    // text = "Nav One Nav Two body prose" (26 chars), links = "Nav One Nav Two" (15)
    assert(d(0) === math.round(15.0 / 26.0 * 1e4) / 1e4)
    assert(d(1) === 0.0)
  }

  test("htmlTextRatio: prose-heavy beats markup-heavy") {
    val r = Seq(
      "<p>twelve chars</p>",
      "<div><div><div><span>x</span></div></div></div>")
      .toDF("h").select(TextFunctions.htmlTextRatio(col("h"))).as[Double].collect()
    assert(r(0) > 0.5 && r(1) < 0.05)
  }

  test("empty and null inputs survive") {
    val out = df("h STRING", Seq(Row(""), Row(null)))
      .select(TextFunctions.htmlText(col("h")).as("t"),
        TextFunctions.htmlLinkDensity(col("h")).as("d"))
      .collect()
    assert(out(0).getString(0) === "" && out(0).getDouble(1) === 0.0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }
}
