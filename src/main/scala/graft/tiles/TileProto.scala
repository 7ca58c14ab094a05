package graft.tiles

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Map-tile protobuf messages and a dependency-free proto3 wire-format
  * codec (the container ships no protobuf-java runtime).
  *
  * Schema reproduced from the reference's generated descriptor
  * (reference: flows/tiles_pb2.py:16; field names also visible in
  * flows/common.py:414-433 and tests/unit/test_compute_tiling.py:20-31):
  *
  * {{{
  * message TileStats { uint64 count=1; double sum=2; double avg=3;
  *                     double s_sum_t_sum=4; double s_sum_t_mean=5;
  *                     double weight=6; }
  * message TileBins  { map<uint32, TileStats> stats=1; uint32 totalBins=2; }
  * message TileCoord { uint32 x=1; uint32 y=2; uint32 z=3; int64 t=4; }
  * message Tile      { TileCoord coord=1; TileBins bins=2; }
  * }}}
  *
  * Encoding follows the public protobuf wire format (varint keys,
  * little-endian fixed64 doubles, length-delimited submessages; proto3
  * zero-default fields omitted). Map entries are written in ascending key
  * order so output bytes are deterministic.
  */
object TileProto {

  final case class TileStats(
      count: Long = 0L,
      sum: Double = 0.0,
      avg: Double = 0.0,
      sSumTSum: Double = 0.0,
      sSumTMean: Double = 0.0,
      weight: Double = 0.0
  )

  final case class Tile(
      x: Int, y: Int, z: Int, t: Long,
      totalBins: Int,
      stats: Map[Int, TileStats]
  )

  // ---- low-level writers ---------------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def key(field: Int, wireType: Int): Int = (field << 3) | wireType

  private def writeVarintField(out: ByteArrayOutputStream, field: Int, v: Long): Unit =
    if (v != 0L) { writeVarint(out, key(field, 0).toLong); writeVarint(out, v) }

  private def writeDoubleField(out: ByteArrayOutputStream, field: Int, v: Double): Unit =
    if (v != 0.0) {
      writeVarint(out, key(field, 1).toLong)
      val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      buf.putDouble(v)
      out.write(buf.array())
    }

  private def writeMessageField(out: ByteArrayOutputStream, field: Int, body: Array[Byte]): Unit = {
    writeVarint(out, key(field, 2).toLong)
    writeVarint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  // ---- message encoders ----------------------------------------------------

  def encodeStats(s: TileStats): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeVarintField(out, 1, s.count)
    writeDoubleField(out, 2, s.sum)
    writeDoubleField(out, 3, s.avg)
    writeDoubleField(out, 4, s.sSumTSum)
    writeDoubleField(out, 5, s.sSumTMean)
    writeDoubleField(out, 6, s.weight)
    out.toByteArray
  }

  def encode(tile: Tile): Array[Byte] = {
    val coord = new ByteArrayOutputStream()
    writeVarintField(coord, 1, tile.x.toLong & 0xffffffffL)
    writeVarintField(coord, 2, tile.y.toLong & 0xffffffffL)
    writeVarintField(coord, 3, tile.z.toLong & 0xffffffffL)
    writeVarintField(coord, 4, tile.t) // int64

    val bins = new ByteArrayOutputStream()
    tile.stats.toSeq.sortBy(_._1).foreach { case (binIdx, st) =>
      val entry = new ByteArrayOutputStream()
      writeVarintField(entry, 1, binIdx.toLong & 0xffffffffL)
      writeMessageField(entry, 2, encodeStats(st))
      writeMessageField(bins, 1, entry.toByteArray)
    }
    writeVarintField(bins, 2, tile.totalBins.toLong & 0xffffffffL)

    val out = new ByteArrayOutputStream()
    writeMessageField(out, 1, coord.toByteArray)
    writeMessageField(out, 2, bins.toByteArray)
    out.toByteArray
  }

  // ---- decoder (round-trip tests / the inspect-tile dev tool) --------------

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var result = 0L
      while (true) {
        val b = bytes(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      result
    }
    def readDouble(): Double = {
      val v = ByteBuffer.wrap(bytes, pos, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble
      pos += 8; v
    }
    def readBytes(): (Int, Int) = { // (start, end) of a length-delimited field
      val len = readVarint().toInt
      val start = pos
      pos += len
      (start, start + len)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => val len = readVarint().toInt; pos += len
      case 5 => pos += 4
    }
  }

  def decode(bytes: Array[Byte]): Tile = {
    var x, y, z = 0; var t = 0L; var totalBins = 0
    val stats = scala.collection.mutable.Map.empty[Int, TileStats]

    def decodeStats(r: Reader): TileStats = {
      var s = TileStats()
      while (r.hasMore) {
        val k = r.readVarint(); val f = (k >> 3).toInt; val w = (k & 7).toInt
        f match {
          case 1 => s = s.copy(count = r.readVarint())
          case 2 => s = s.copy(sum = r.readDouble())
          case 3 => s = s.copy(avg = r.readDouble())
          case 4 => s = s.copy(sSumTSum = r.readDouble())
          case 5 => s = s.copy(sSumTMean = r.readDouble())
          case 6 => s = s.copy(weight = r.readDouble())
          case _ => r.skip(w)
        }
      }
      s
    }

    val top = new Reader(bytes, 0, bytes.length)
    while (top.hasMore) {
      val k = top.readVarint(); val f = (k >> 3).toInt; val w = (k & 7).toInt
      f match {
        case 1 => // coord
          val (s0, e0) = top.readBytes(); val r = new Reader(bytes, s0, e0)
          while (r.hasMore) {
            val ck = r.readVarint(); val cf = (ck >> 3).toInt; val cw = (ck & 7).toInt
            cf match {
              case 1 => x = r.readVarint().toInt
              case 2 => y = r.readVarint().toInt
              case 3 => z = r.readVarint().toInt
              case 4 => t = r.readVarint()
              case _ => r.skip(cw)
            }
          }
        case 2 => // bins
          val (s0, e0) = top.readBytes(); val r = new Reader(bytes, s0, e0)
          while (r.hasMore) {
            val bk = r.readVarint(); val bf = (bk >> 3).toInt; val bw = (bk & 7).toInt
            bf match {
              case 1 => // map entry
                val (es, ee) = r.readBytes(); val er = new Reader(bytes, es, ee)
                var binIdx = 0; var st = TileStats()
                while (er.hasMore) {
                  val ek = er.readVarint(); val ef = (ek >> 3).toInt; val ew = (ek & 7).toInt
                  ef match {
                    case 1 => binIdx = er.readVarint().toInt
                    case 2 =>
                      val (vs, ve) = er.readBytes()
                      st = decodeStats(new Reader(bytes, vs, ve))
                    case _ => er.skip(ew)
                  }
                }
                stats(binIdx) = st
              case 2 => totalBins = r.readVarint().toInt
              case _ => r.skip(bw)
            }
          }
        case _ => top.skip(w)
      }
    }
    Tile(x, y, z, t, totalBins, stats.toMap)
  }
}
