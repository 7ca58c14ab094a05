package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Schema

/** Slippy-map (WebMercator) tile arithmetic as pure Catalyst column
  * expressions — no UDFs, fully codegen'd, so the zoom-14 binning of billions
  * of rows stays inside whole-stage codegen.
  *
  * Semantics (reference: flows/common.py:166-215; public formulas from
  * wiki.openstreetmap.org/wiki/Slippy_map_tilenames):
  *  - deg2num truncates toward zero (Python `int()`), which `cast("int")`
  *    reproduces exactly (values are non-negative for in-range lat/lng).
  *  - parent_tile / tile_coord divide x,y by 2^l with floor.
  *  - project maps a subtile into the owning tile's 2^d x 2^d bin grid:
  *    bin = (sx - tx*2^d) + (sy - ty*2^d) * 2^d.
  */
object TileMath {

  /** `struct<z:int, x:int, y:int>` tile coordinate for a lat/lng at a zoom. */
  def deg2num(lat: Column, lng: Column, zoom: Int): Column = {
    val n = pow(lit(2.0), lit(zoom))
    val xtile = ((lng + lit(180.0)) / lit(360.0) * n).cast("int")
    val ytile = ((lit(1.0) - asinh(tan(radians(lat))) / lit(math.Pi)) / lit(2.0) * n).cast("int")
    struct(lit(zoom).as("z"), xtile.as("x"), ytile.as("y"))
  }

  /** Tile `l` zoom levels up: (z-l, floor(x/2^l), floor(y/2^l)). */
  def parentTile(tile: Column, l: Int = 1): Column =
    struct(
      (tile.getField("z") - lit(l)).as("z"),
      floor(tile.getField("x") / pow(lit(2.0), lit(l))).cast("int").as("x"),
      floor(tile.getField("y") / pow(lit(2.0), lit(l))).cast("int").as("y")
    )

  /** The main tile owning a subtile, `LevelDiff` zooms up. */
  def tileCoord(subtile: Column, leveldiff: Int = Schema.LevelDiff): Column =
    parentTile(subtile, leveldiff)

  /** Bin index of a subtile within its owning tile's 4^zdiff grid. */
  def project(subtile: Column, tile: Column): Column = {
    val zdiff = subtile.getField("z") - tile.getField("z")
    val side = pow(lit(2.0), zdiff.cast("double"))
    val binx = subtile.getField("x") - (side * tile.getField("x")).cast("int")
    val biny = subtile.getField("y") - (side * tile.getField("y")).cast("int")
    (binx + biny * side.cast("int")).cast("int")
  }

  /** Z-order (Morton) key of a tile x/y pair — the storage-layout key for
    * spatial clustering: `df.repartitionByRange(col("z"))` (or a sort on
    * it before write) keeps 2-D-adjacent subtiles in the same parquet row
    * groups, so viewport / parent-tile scans at 100 TB prune to a few
    * contiguous files. Delegates to the native codegen'd
    * [[graft.functions.ZOrder60]] expression (low 30 bits per axis),
    * registered on the ACTIVE session — multi-session JVMs must call
    * `GraftExtensions.register` on the session analyzing the plan. */
  def zorder(x: Column, y: Column): Column = {
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("zorder60", x.cast("long"), y.cast("long"))
  }
}
