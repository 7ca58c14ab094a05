package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField}

import graft.model.Schema

/** Datacube ingest (S1-S5; reference: flows/data_pipeline.py:150-235).
  *
  *  - S1: parquet read. Object-store access is Spark-native: pass
  *    `s3a://...` paths with `fs.s3a.*` credentials on the Hadoop conf —
  *    no separate client code needed.
  *  - S3: files matching `_str(.N)?.parquet(.gzip)?` hold string-typed
  *    values and are skipped (filename-level pushdown).
  *  - S4: multi-file schema unification. The reference COERCES rather than
  *    fails: columns missing from a file are filled with the empty string;
  *    `feature` is forced string; region columns whose dtypes conflict
  *    across files are null-filled with "None" and re-typed string. Plain
  *    `mergeSchema` would abort on conflicting dtypes, so unification is
  *    explicit per-file projection + `unionByName`.
  *  - S5: hard failures on empty path list / all-string files / zero rows.
  *
  * Scale: per-file projections are narrow and codegen'd; the union is a
  * plan-level concatenation (no shuffle); parquet row-group pruning and
  * column pruning pass straight through.
  */
object Ingest {

  private val StrFileRe = ".*_str(\\.[0-9]+)?\\.parquet(\\.gzip)?$".r

  def isStringTypedFile(path: String): Boolean =
    StrFileRe.matches(basename(path))

  /** URL basename with any query/fragment stripped — presigned URLs carry
    * `?X-Amz-...` suffixes that must not defeat the `_str` filename filter.
    * The query is stripped BEFORE splitting on '/': a raw '/' inside a
    * query value (legal per RFC 3986, common in redirect params) would
    * otherwise become the basename. */
  private def basename(path: String): String =
    path.takeWhile(c => c != '?' && c != '#').split('/').last

  /** S2: paths Spark's parquet source cannot open directly (datasets often
    * arrive as presigned http(s) URLs; the reference reads them per-file
    * with pandas, which accepts URLs — flows/data_pipeline.py:179-182). */
  def isDownloadUrl(path: String): Boolean =
    path.startsWith("http://") || path.startsWith("https://")

  /** Fetch one URL into its own subdirectory of `dir` (distinct URLs can
    * share a basename — e.g. presigned re-uploads of `data.parquet` from
    * different prefixes — and must not overwrite each other), returning a
    * file: URI Spark can read. Driver-side and sequential like the
    * reference's per-file loop; input files are bounded uploads, not
    * 100 TB shards. Temp files are registered for JVM-exit deletion (the
    * returned DataFrame reads them lazily, so they must outlive this
    * call). */
  private[sources] def downloadToTemp(url: String, dir: java.nio.file.Path,
                                      index: Int = 0): String = {
    val sub = java.nio.file.Files.createDirectories(dir.resolve(index.toString))
    val target = sub.resolve(basename(url))
    // deleteOnExit runs in REVERSE registration order, so the directory
    // must register BEFORE the file for the tree to actually come off disk
    sub.toFile.deleteOnExit()
    target.toFile.deleteOnExit()
    // bounded connect/read timeouts: a stalled presigned-URL server must
    // fail ingest loudly, not hang it; and a non-2xx response must fail
    // HERE (an HTML error page copied to .parquet would otherwise surface
    // later as an opaque parquet parse failure)
    val conn = java.net.URI.create(url).toURL.openConnection()
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    conn match {
      case http: java.net.HttpURLConnection =>
        val code = http.getResponseCode
        if (code < 200 || code >= 300) {
          http.disconnect()
          throw new java.io.IOException(s"GET $url returned HTTP $code")
        }
      case _ => // file: and other direct-stream schemes have no status code
    }
    val in = conn.getInputStream
    try java.nio.file.Files.copy(in, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    target.toUri.toString
  }

  def readData(spark: SparkSession, paths: Seq[String],
               needsDownload: String => Boolean = isDownloadUrl): DataFrame = {
    require(paths.nonEmpty, "no input data paths given")
    // the _str filter runs on the ORIGINAL paths (URL basenames included)
    // so string-typed files are never even downloaded
    val numericPaths = paths.filterNot(isStringTypedFile)
    require(numericPaths.nonEmpty, s"no numeric parquet files in ${paths.mkString(",")}")

    lazy val tmpDir = {
      val d = java.nio.file.Files.createTempDirectory("graft-ingest-")
      d.toFile.deleteOnExit()
      d
    }
    val localPaths = numericPaths.zipWithIndex.map { case (p, i) =>
      if (needsDownload(p)) downloadToTemp(p, tmpDir, i) else p
    }

    val dfs = localPaths.map(p => spark.read.parquet(p))
    val unified = unifySchemas(dfs)
    require(!unified.isEmpty, "input data has 0 rows")
    unified
  }

  /** S4 unification across already-loaded frames (separable for tests). */
  def unifySchemas(dfs: Seq[DataFrame]): DataFrame = {
    // ordered union of all columns (first-seen order, like the reference's
    // pandas union of Index objects)
    val allCols = dfs.foldLeft(Vector.empty[String]) { (acc, df) =>
      acc ++ df.columns.filterNot(acc.contains)
    }
    def dtypeOf(df: DataFrame, c: String): Option[StructField] =
      df.schema.fields.find(_.name == c)

    // a column must become string when it's `feature`, when files disagree
    // on its type (the reference re-types region columns on conflict; we
    // apply the same rule to any conflicted column), or when it's MISSING
    // from any file — the missing-column fill is the string '', so a
    // column left numeric in the files that have it would type-conflict
    // the union (an ANSI-mode runtime cast error)
    val forceString: Set[String] = allCols.filter { c =>
      val types = dfs.flatMap(dtypeOf(_, c)).map(_.dataType).distinct
      c == "feature" || types.length > 1 ||
        dfs.exists(df => !df.columns.contains(c))
    }.toSet

    val projected = dfs.map { df =>
      val cols = allCols.map { c =>
        if (!df.columns.contains(c))
          lit("").cast(StringType).as(c) // missing column -> empty string
        else if (forceString.contains(c)) {
          val base =
            if (Schema.RegionLevels.contains(c))
              coalesce(col(c).cast(StringType), lit(Schema.NoneStr))
            else col(c).cast(StringType)
          base.as(c)
        } else col(c)
      }
      df.select(cols: _*)
    }
    projected.reduce(_.unionByName(_))
  }
}
