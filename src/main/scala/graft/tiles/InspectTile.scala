package graft.tiles

import java.nio.file.{Files, Paths}

/** Dev tool: decode and print a `.tile` protobuf file (port of the
  * reference's scripts/inspect_tile_pb.py).
  *
  * Usage: runMain graft.tiles.InspectTile <file.tile> [...]
  */
object InspectTile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: InspectTile <file.tile> [...]")
    args.foreach { path =>
      val tile = TileProto.decode(Files.readAllBytes(Paths.get(path)))
      println(s"$path: coord=(z=${tile.z}, x=${tile.x}, y=${tile.y}, t=${tile.t}) " +
        s"totalBins=${tile.totalBins} bins=${tile.stats.size}")
      tile.stats.toSeq.sortBy(_._1).foreach { case (bin, s) =>
        println(f"  bin $bin%4d: s_sum_t_sum=${s.sSumTSum}%.4f " +
          f"s_sum_t_mean=${s.sSumTMean}%.4f weight=${s.weight}%.1f " +
          f"count=${s.count} sum=${s.sum}%.4f avg=${s.avg}%.4f")
      }
    }
  }
}
