package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sitemap.xml ingestion — the discovery side of the crawl front end
  * (robots.txt points at sitemaps; sitemaps enumerate the URLs a crawl
  * should fetch). Parses both document shapes of the sitemaps.org
  * protocol with ONE grammar: `<urlset>` files carry `<url>` entries,
  * `<sitemapindex>` files carry `<sitemap>` entries (children are more
  * sitemaps) — each entry is a block with a required `<loc>` and an
  * optional `<lastmod>`.
  *
  * Everything is codegen'd column work (regexp over the XML text — the
  * entry grammar is regular; no XML library, no UDF), so parsing runs
  * at scan speed and the only data that leaves the scan is the
  * (id, kind, loc, lastmod) entry stream. Malformed blocks simply
  * contribute no entry — reject-don't-crash at the row grain. */
object Sitemaps {

  /** One row per sitemap entry: (id, kind 'url'|'sitemap', loc,
    * lastmod nullable). `(?s)` lets blocks span lines; loc whitespace is
    * trimmed as the protocol requires. */
  def entries(df: DataFrame, idCol: String, xmlCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(expr(
          s"regexp_extract_all($xmlCol, '(?s)<(url|sitemap)>(.*?)</(?:url|sitemap)>', 0)"))
          .as("block"))
      .select(col("id"),
        regexp_extract(col("block"), "^<(url|sitemap)>", 1).as("kind"),
        trim(regexp_extract(col("block"), "(?s)<loc>\\s*(.*?)\\s*</loc>", 1))
          .as("loc"),
        nullif(regexp_extract(col("block"),
          "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1), lit("")).as("lastmod"))
      .filter(col("loc") =!= "")
}
