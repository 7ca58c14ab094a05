package graft.tools

import java.nio.file.{Files, Paths}

import graft.tiles.TileProto

/** Dev tool: read a protobuf `.tile` file and print its content in
  * protobuf text format — the map-tile analog of a parquet dumper, for
  * inspecting and debugging tile output by eye.
  *
  * Port of the one §2.9 reference utility with engine-dev value
  * (reference: scripts/inspect_tile_pb.py:1-26, which ParseFromString's
  * a Tile and `print(tile)`s it). Output matches the reference tool's
  * Python `text_format` rendering on the pipeline's tiles: map entries
  * sorted by key, proto3 zero-default fields omitted, two-space nesting,
  * and doubles in shortest-round-trip form.
  *
  * Usage: `sbt "runMain graft.tools.InspectTile path/to/0-8-156-120.tile"`
  */
object InspectTile {

  def main(args: Array[String]): Unit = {
    if (args.length != 1) {
      System.err.println(s"Usage: InspectTile TILE_FILE")
      System.err.println(s"Example: InspectTile 1546300800000-5-19-15.tile")
      sys.exit(-1)
    }
    val tile = TileProto.decode(Files.readAllBytes(Paths.get(args(0))))
    print(render(tile))
  }

  /** Python text_format renders doubles via repr: shortest round-trip,
    * always with a decimal point or exponent, lowercase `e+NN`/`e-NN`.
    * Java's Double.toString is also shortest-round-trip but differs in
    * TWO ways: the exponent spelling (`E5` vs `e+05`) and the switchover
    * thresholds — Java goes scientific at >=1e7 and <1e-3 while Python
    * repr stays plain until >=1e16 and <1e-4. Aggregated tile sums land
    * in [1e7, 1e16) all the time, so both must be handled: re-lay the
    * same shortest digits out as plain decimal where Python would, and
    * translate the exponent spelling elsewhere. */
  private[graft] def pyDouble(v: Double): String = {
    // non-finite spellings differ too: Java NaN/Infinity, Python nan/inf
    if (v.isNaN) return "nan"
    if (v == Double.PositiveInfinity) return "inf"
    if (v == Double.NegativeInfinity) return "-inf"
    val s = java.lang.Double.toString(v)
    val e = s.indexOf('E')
    if (e < 0) s
    else {
      val a = math.abs(v)
      if (a >= 1e-4 && a < 1e16) {
        // Java went scientific where Python repr stays plain (e.g.
        // "1.2345678E7" vs "12345678.0"): same digits, plain layout
        val plain = new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
        if (plain.contains('.')) plain else plain + ".0"
      } else {
        // "1.0E100" -> "1e+100", "-1.23E-7" -> "-1.23e-07"
        val mant0 = s.substring(0, e).stripSuffix(".0")
        val exp = s.substring(e + 1)
        val (sign, digits) =
          if (exp.startsWith("-")) ("-", exp.substring(1)) else ("+", exp)
        val padded = if (digits.length < 2) "0" + digits else digits
        s"${mant0}e$sign$padded"
      }
    }
  }

  /** The text-format body: proto3 semantics, so zero-default scalars are
    * omitted (an all-default TileStats renders as an empty `value {}`),
    * and map entries print in ascending key order. */
  def render(tile: TileProto.Tile): String = {
    val sb = new StringBuilder
    def line(indent: Int, s: String): Unit = {
      var i = 0
      while (i < indent) { sb.append("  "); i += 1 }
      sb.append(s).append('\n')
    }
    def uintField(indent: Int, name: String, v: Long): Unit =
      if (v != 0L) line(indent, s"$name: $v")
    def doubleField(indent: Int, name: String, v: Double): Unit =
      if (v != 0.0) line(indent, s"$name: ${pyDouble(v)}")

    val coordBody = tile.x != 0 || tile.y != 0 || tile.z != 0 || tile.t != 0L
    if (coordBody) {
      line(0, "coord {")
      uintField(1, "x", tile.x.toLong & 0xffffffffL)
      uintField(1, "y", tile.y.toLong & 0xffffffffL)
      uintField(1, "z", tile.z.toLong & 0xffffffffL)
      uintField(1, "t", tile.t)
      line(0, "}")
    }
    if (tile.stats.nonEmpty || tile.totalBins != 0) {
      line(0, "bins {")
      tile.stats.toSeq.sortBy(_._1).foreach { case (k, st) =>
        line(1, "stats {")
        uintField(2, "key", k.toLong & 0xffffffffL)
        line(2, "value {")
        uintField(3, "count", st.count)
        doubleField(3, "sum", st.sum)
        doubleField(3, "avg", st.avg)
        doubleField(3, "s_sum_t_sum", st.sSumTSum)
        doubleField(3, "s_sum_t_mean", st.sSumTMean)
        doubleField(3, "weight", st.weight)
        line(2, "}")
        line(1, "}")
      }
      uintField(1, "totalBins", tile.totalBins.toLong & 0xffffffffL)
      line(0, "}")
    }
    sb.toString
  }
}
