package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.io.Layout
import graft.operators.TileMath

/** [[Layout.writeClustered]] + [[TileMath.zorder]]: the written files must
  * own (near-)disjoint Z ranges, and a parent-tile range scan must touch
  * only the few files whose range intersects it — the pruning property the
  * layout exists to deliver.
  */
class LayoutSpec extends SparkSpec {

  test("z-clustered files own disjoint ranges and parent scans prune") {
    val dir = Files.createTempDirectory("graft-layout").toFile.getAbsolutePath
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield Row(x.toLong, y.toLong)
    val in = df("x LONG, y LONG", grid)
      .withColumn("z", TileMath.zorder(col("x"), col("y")))
    val numFiles = 16
    Layout.writeClustered(in, col("z"), numFiles, dir)

    // every row survives the layout
    assert(spark.read.parquet(dir).count() === 64L * 64L)

    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length === numFiles)

    // per-file (min, max) of the clustering key: ranges must be pairwise
    // disjoint (range partitioning + within-partition sort)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("z"), max("z")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo) }

    // parent-prefix pruning: each zoom-3-up parent of the 64x64 grid owns
    // the contiguous range [zp << 6, (zp+1) << 6) of 64 cells; at 4096
    // cells over 16 balanced files (256 cells each), every parent range
    // must intersect at most 2 files (1 + a boundary straddle)
    for (px <- 0L until 8L; py <- 0L until 8L) {
      val zp = graft.functions.ZOrder60.interleave(px, py)
      val (lo, hi) = (zp << 6, ((zp + 1) << 6) - 1)
      val touched = sorted.count { case (mn, mx) => mx >= lo && mn <= hi }
      assert(touched <= 2, s"parent ($px,$py) touches $touched files")
    }
  }
}
