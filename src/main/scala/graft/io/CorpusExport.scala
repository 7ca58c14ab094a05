package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Profile

/** The dataset-publisher end of the curation pipeline: write a corpus as
  * deterministic hash shards plus the manifest a consumer needs to use
  * (and trust) the export — shard inventory with per-shard row counts
  * and the [[Profile.columnProfile]] dataset card.
  *
  * Shard assignment is content-addressed (`hash60(id) mod n`), so a
  * re-export of the same corpus lands every row in the same shard —
  * diffs between exports are real data changes, not shuffle noise — and
  * the layout is `partitionBy(shard)` so per-shard consumers
  * partition-prune. The manifest is written LAST (the Writer-family
  * publish contract: a reader that sees `manifest.json` sees a complete
  * export). */
object CorpusExport {

  private def shardOf(id: org.apache.spark.sql.Column, n: Int) =
    pmod(conv(substring(md5(concat(lit("graft-shard:"), id.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(n.toLong))

  /** Write `docs` as `nShards` hash shards under `dir` + manifest.json.
    * Returns the manifest JSON string (also written to disk). */
  def exportShards(
      docs: DataFrame,
      idCol: String,
      dir: String,
      nShards: Int,
      profileCols: Seq[String]
  ): String = {
    require(nShards >= 1, "need at least one shard")
    docs.withColumn("shard", shardOf(col(idCol), nShards))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/data")
    val spark = docs.sparkSession
    val written = spark.read.parquet(s"$dir/data")
    // partition-directory values read back as Int — cast before collect
    val perShard = written.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val profile = Profile.columnProfile(written, profileCols)
      .orderBy("column").collect()
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val shardJson = perShard
      .map { case (sId, n) => s"""{"shard":$sId,"rows":$n}""" }
      .mkString("[", ",", "]")
    val profJson = profile.map { r =>
      val mn = Option(r.getString(4)).map(q).getOrElse("null")
      val mx = Option(r.getString(5)).map(q).getOrElse("null")
      s"""{"column":${q(r.getString(0))},"n_rows":${r.getLong(1)},"n_nulls":${r.getLong(2)},"n_distinct":${r.getLong(3)},"min":$mn,"max":$mx}"""
    }.mkString("[", ",", "]")
    val manifest =
      s"""{"n_shards":$nShards,"n_rows":${perShard.map(_._2).sum},"shards":$shardJson,"profile":$profJson}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/manifest.json"), manifest)
    manifest
  }

  /** Read an export back; `shard` column dropped (consumer-facing rows
    * are the original corpus). */
  def readShards(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/data").drop("shard")
}
