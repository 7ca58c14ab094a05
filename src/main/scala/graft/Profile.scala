package graft

import org.apache.spark.sql.SparkSession

/** Stage-level timing probe: materializes the shared cube caches one step at
  * a time so per-query bench numbers can be attributed to build vs compute.
  * Usage: runMain graft.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_COMPRESSED", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    import graft.testbed.{Datacube, DatacubeQueries => Q}
    time("warmup(count lineitem)")(Datacube.table(spark, sfDir, "lineitem").count())
    time("base_cube_nocache")(Datacube(spark, sfDir).count())
    time("base_cube_cache")(Q.baseCube(spark, sfDir).count())
    time("base_cube_cached_again")(Q.baseCube(spark, sfDir).count())
    time("month_cube(count)")(Q.temporalCube(spark, sfDir, "month").count())
    time("month_cube_again")(Q.temporalCube(spark, sfDir, "month").count())
    time("all_cube")(Q.temporalCube(spark, sfDir, "all").count())
    time("weighted_year_cube")(Q.temporalCube(spark, sfDir, "year", weighted = true).count())
    time("a10_after_cube")(Q.queries("a10_qualifier_pivot")(spark, sfDir).count())
    time("a11_after_cube")(Q.queries("a11_extrema")(spark, sfDir).count())
    time("a17_after_cube")(Q.queries("a17_tile_bins")(spark, sfDir).count())
    // A/B the two pyramid strategies on the same cached subtile frame
    val subtiles = Q.subtileAgg(spark, sfDir).cache()
    time("subtile_cache_build")(subtiles.count())
    time("pyramid_explode")(graft.tiles.Tiling.binsPyramid(subtiles).count())
    time("pyramid_explode_again")(graft.tiles.Tiling.binsPyramid(subtiles).count())
    time("pyramid_progressive")(graft.tiles.Tiling.binsPyramidProgressive(subtiles).count())
    time("pyramid_progressive_again")(graft.tiles.Tiling.binsPyramidProgressive(subtiles).count())
    subtiles.unpersist()
    time("d2_jaccard")(SparkEntry.queries("d2_jaccard_neardup")(spark, sfDir).count())
    time("d3_minhash")(SparkEntry.queries("d3_minhash_lsh")(spark, sfDir).count())
    time("d4_clusters")(SparkEntry.queries("d4_dedup_clusters")(spark, sfDir).count())
    time("d5_capped")(SparkEntry.queries("d5_jaccard_capped")(spark, sfDir).count())
    time("d6_clusters_star")(SparkEntry.queries("d6_dedup_clusters_star")(spark, sfDir).count())
    time("d7_embedding_neardup")(SparkEntry.queries("d7_embedding_neardup")(spark, sfDir).count())
    time("t7_winnowing")(SparkEntry.queries("t7_winnowing")(spark, sfDir).count())
    time("v3_ivf")(SparkEntry.queries("v3_ivf_topk")(spark, sfDir).count())
    // the occupancy-held-constant configuration of the embedding near-dup
    // join: 10 planes = 1024 buckets/table keeps per-bucket population at
    // a 20k-vector corpus comparable to d7's at 2k — cost should track the
    // corpus, not its square (SCALE.md)
    time("d7_planes10") {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      graft.operators.Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        minCosine = 0.4, dims = 64, tables = 8, planesPerTable = 10).count()
    }
    spark.stop()
  }
}
