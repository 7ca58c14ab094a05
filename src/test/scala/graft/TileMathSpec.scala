package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.TileMath

/** Tile math golden values + seeded property checks (reference formulas:
  * flows/common.py:166-215; public slippy-map math). Property samples are
  * batched into one DataFrame so each property is a single Spark job. */
class TileMathSpec extends SparkSpec {

  private def tileOf(lat: Double, lng: Double, zoom: Int): (Int, Int, Int) = {
    val r = df("lat DOUBLE, lng DOUBLE", Seq(Row(lat, lng)))
      .select(TileMath.deg2num(col("lat"), col("lng"), zoom).as("t"))
      .select("t.z", "t.x", "t.y").head()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("deg2num matches the reference's slippy formula on known points") {
    // (0,0) is exactly the center of the 2^z grid
    assert(tileOf(0.0, 0.0, 14) === (14, 8192, 8192))
    assert(tileOf(0.0, 0.0, 0) === (0, 0, 0))
    // the reference subtile test's Ethiopia point (tests/unit/
    // test_subtile_aggregation.py:23) lands on subtile (14, 10041, 7726)
    val (z, x, y) = tileOf(10.168, 40.646, 14)
    assert((z, x, y) === (14, 10041, 7726))
  }

  test("tile_coord walks LEVEL_DIFF=6 zooms up (reference golden)") {
    // reference test expects subtile (14,10041,7726) -> tile (8,156,120)
    val r = df("z INT, x INT, y INT", Seq(Row(14, 10041, 7726)))
      .select(TileMath.tileCoord(struct(col("z"), col("x"), col("y"))).as("t"))
      .select("t.z", "t.x", "t.y").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === (8, 156, 120))
  }

  test("project: reference golden bin indices") {
    // (14,10041,7726) in tile (8,156,120) -> bin 3001;
    // (14,9632,7755) in tile (8,150,121)  -> bin 736
    val rows = df("sz INT, sx INT, sy INT", Seq(Row(14, 10041, 7726), Row(14, 9632, 7755)))
      .withColumn("sub", struct(col("sz").as("z"), col("sx").as("x"), col("sy").as("y")))
      .withColumn("tile", TileMath.tileCoord(col("sub")))
      .select(TileMath.project(col("sub"), col("tile")).as("bin"))
      .collect().map(_.getInt(0)).toSeq
    assert(rows === Seq(3001, 736))
  }

  private val rnd = new scala.util.Random(42)
  private val samples: Seq[(Int, Int)] =
    Seq.fill(300)((rnd.nextInt(16384), rnd.nextInt(16384)))

  test("property: parent_tile halves coordinates with floor at every level") {
    for (l <- 1 to 6) {
      val in = df("z INT, x INT, y INT", samples.map { case (x, y) => Row(14, x, y) })
      val out = in
        .select(col("x"), col("y"),
          TileMath.parentTile(struct(col("z"), col("x"), col("y")), l).as("p"))
        .select("x", "y", "p.z", "p.x", "p.y").collect()
      out.foreach { r =>
        assert(r.getInt(2) === 14 - l)
        assert(r.getInt(3) === r.getInt(0) >> l)
        assert(r.getInt(4) === r.getInt(1) >> l)
      }
    }
  }

  test("property: project stays in the 4096-bin grid and round-trips") {
    val in = df("z INT, x INT, y INT", samples.map { case (x, y) => Row(14, x, y) })
    val out = in
      .withColumn("sub", struct(col("z"), col("x"), col("y")))
      .withColumn("tile", TileMath.tileCoord(col("sub")))
      .select(col("x"), col("y"),
        TileMath.project(col("sub"), col("tile")).as("bin"),
        col("tile.x").as("tx"), col("tile.y").as("ty"))
      .collect()
    out.foreach { r =>
      val (x, y, bin, tx, ty) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(bin >= 0 && bin < 4096)
      assert(tx * 64 + bin % 64 === x)   // reconstruct subtile x
      assert(ty * 64 + bin / 64 === y)   // reconstruct subtile y
    }
  }
}
