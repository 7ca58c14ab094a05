package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video travel as opaque `binary`
  * payloads with typed metadata; decode / feature-extraction runs as a
  * per-partition batch transform.
  *
  * Container-header decode (PNG IHDR / JPEG SOF / GIF screen descriptor —
  * [[parseImageHeader]]) is REAL: format sniffing, dimensions, and
  * corrupt-payload rejection need no codec library and gate the pipeline
  * at scan speed.
  *
  * Pixel and audio-sample decode are REAL too, JDK-only: [[decodePixels]]
  * runs the payload through `javax.imageio` (PNG/JPEG/GIF/BMP readers ship
  * with the JVM — no external codec), and [[decodePcm]] parses 8/16-bit PCM
  * samples out of a WAV `data` chunk by hand. Both are lossless for their
  * battery formats (PNG, PCM), so integer pixel/sample statistics are exact
  * and oracle-checkable. Only compressed-video frame decode remains out of
  * scope (H.264 et al. genuinely need a codec library);
  * [[fakeDecodeFeatures]] survives as the deterministic stand-in for an
  * embedding-model stage, and a production runtime (JNI codec, ONNX, ...)
  * slots into [[decodePartition]] without touching the plan.
  *
  * Scale design: payloads never pass through a shuffle wider than their
  * grouping key; feature extraction is `mapPartitions` (one decoder
  * instance per partition, batch-amortized), and metadata-only queries
  * never deserialize the payload column (Parquet column pruning).
  */
object Multimodal {

  /** Metadata struct accompanying every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)
  ))

  val FeatureDims = 8

  /** Wrap a text/binary column as a multimodal payload with metadata —
    * pure column expressions, no UDF. */
  def withPayload(df: DataFrame, srcCol: String, mediaType: String): DataFrame =
    df
      .withColumn("payload", col(srcCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit(mediaType).as("media_type"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"),
        md5(col("payload")).as("checksum")))

  /** Deterministic stand-in for a media decoder: an `FeatureDims`-dim
    * feature vector from byte statistics of the payload. Replace with a
    * real decoder for production. */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    val out = new Array[Double](FeatureDims)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDims) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < FeatureDims) { out(j) /= math.max(1, payload.length / FeatureDims); j += 1 }
    }
    out
  }

  /** Partition-wise decode: one decoder instance per partition (the batch
    * shape a real codec/model runtime needs), emitting (id, features). */
  def decodePartition(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // a real implementation would initialize the decoder HERE, once
        rows.map { case (id, payload) => (id, fakeDecodeFeatures(payload)) }
      }
      .toDF("id", "features")
  }

  /** Parsed image header: container format and pixel dimensions. */
  final case class ImageHeader(format: String, width: Int, height: Int)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** REAL (not stubbed) container-header decode for the three ubiquitous
    * web-image formats — the falsifiable part of the media pipeline that
    * needs no codec library:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk is REQUIRED first, so
    *    width/height are the big-endian u32 pair at offsets 16/20;
    *  - JPEG: `FF D8` SOI, then a walk of `FF mm len` segments to the
    *    first frame header (SOF0–SOF15 except the DHT/DAC/RST aliases
    *    C4/C8/CC), whose payload is [precision u8][height u16][width u16];
    *  - GIF: `GIF87a`/`GIF89a`, width/height little-endian u16 at 6/8.
    *
    * Returns None for anything else (including truncated headers) — a
    * production pixel decoder slots in AFTER this gate, which already
    * rejects mislabeled/corrupt payloads at scan speed. */
  def parseImageHeader(bytes: Array[Byte]): Option[ImageHeader] = {
    if (bytes == null || bytes.length < 10) return None
    // PNG
    val pngSig = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (bytes.length >= 24 && pngSig.indices.forall(i => (bytes(i) & 0xff) == pngSig(i))
        && bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
      val w = be32(bytes, 16); val h = be32(bytes, 20)
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        return Some(ImageHeader("png", w.toInt, h.toInt))
      return None
    }
    // JPEG
    if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var o = 2
      while (o + 3 < bytes.length) {
        if ((bytes(o) & 0xff) != 0xff) return None // desynced segment walk
        val marker = bytes(o + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
          o += 2 // standalone markers: SOI / RSTn carry no length
        } else if (marker == 0xff) {
          o += 1 // fill byte
        } else {
          val len = be16(bytes, o + 2)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (o + 9 > bytes.length) return None // last read is bytes(o+8)
            val h = be16(bytes, o + 5); val w = be16(bytes, o + 7)
            if (w > 0 && h > 0) return Some(ImageHeader("jpeg", w, h))
            return None
          }
          o += 2 + len
        }
      }
      return None
    }
    // GIF
    if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
      val w = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
      val h = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
      if (w > 0 && h > 0) return Some(ImageHeader("gif", w, h))
      return None
    }
    None
  }

  /** Parsed audio/video container header. `sampleRate`/`channels`/
    * `bitsPerSample` are 0 where the container doesn't carry them (MP4
    * needs the codec-level sample entries for those). */
  final case class AvHeader(
      format: String, durationMs: Long,
      sampleRate: Int, channels: Int, bitsPerSample: Int)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL audio/video container-header decode, same contract as
    * [[parseImageHeader]]:
    *
    *  - WAV: `RIFF….WAVE` then a chunk walk — `fmt ` carries channels /
    *    sample rate / bits per sample (little-endian), `data`'s size over
    *    `fmt `'s byte rate gives the duration;
    *  - MP4 (ISO BMFF): a `size type` box walk — requires a leading
    *    `ftyp`, then reads `moov`/`mvhd` (version 0 or 1) for
    *    timescale + duration.
    *
    * Returns None for anything else, including truncated or desynced
    * walks — the corpus-hygiene gate before any real codec runs. */
  def parseAvHeader(bytes: Array[Byte]): Option[AvHeader] = {
    if (bytes == null || bytes.length < 16) return None
    // WAV
    if (tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE") {
      var o = 12
      var rate = 0L; var channels = 0; var bits = 0; var byteRate = 0L
      var dataLen = -1L
      while (o + 8 <= bytes.length) {
        val id = tag(bytes, o); val len = le32(bytes, o + 4)
        if (id == "fmt " && o + 8 + 16 <= bytes.length) {
          channels = le16(bytes, o + 10)
          rate = le32(bytes, o + 12)
          byteRate = le32(bytes, o + 16)
          bits = le16(bytes, o + 22)
        } else if (id == "data") {
          dataLen = len
        }
        // advance in LONG arithmetic: len is an unsigned 32-bit field, so
        // .toInt could wrap negative and stall or reverse the walk — one
        // malformed chunk length must end the walk, not hang the task
        val next = o.toLong + 8L + len + (len & 1L) // RIFF chunks are word-aligned
        if (next > Int.MaxValue) return None
        o = next.toInt
      }
      if (rate <= 0 || rate > Int.MaxValue || channels <= 0 ||
        dataLen < 0 || byteRate <= 0) return None
      return Some(AvHeader("wav", dataLen * 1000L / byteRate,
        rate.toInt, channels, bits))
    }
    // MP4 — top-level boxes; mvhd searched one level inside moov
    def be64(o: Int): Long =
      (be32(bytes, o) << 32) | be32(bytes, o + 4)
    def findBox(from: Int, until: Int, name: String): Option[(Int, Int)] = {
      var o = from
      while (o + 8 <= until) {
        val size = be32(bytes, o)
        if (size < 8 || o + size > until) return None
        if (tag(bytes, o + 4) == name) return Some((o + 8, o + size.toInt))
        o += size.toInt
      }
      None
    }
    if (bytes.length >= 12 && tag(bytes, 4) == "ftyp") {
      return findBox(0, bytes.length, "moov").flatMap { case (ms, me) =>
        findBox(ms, me, "mvhd").flatMap { case (hs, he) =>
          // bound every read by the box's own content end `he` (<= buffer
          // length): an empty or truncated mvhd must yield None, not an
          // out-of-bounds read — v1 needs 32 content bytes (be64 at
          // hs+24 reads through hs+31), v0 needs 20
          if (hs >= he) None
          else {
            val version = bytes(hs) & 0xff
            // after version+flags (4): creation/modification, then
            // timescale + duration — 4-byte times in v0, 8-byte in v1
            val (timescale, duration) =
              if (version == 1 && hs + 32 <= he)
                (be32(bytes, hs + 20), be64(hs + 24))
              else if (version == 0 && hs + 20 <= he)
                (be32(bytes, hs + 12), be32(bytes, hs + 16))
              else (0L, 0L)
            if (timescale <= 0) None
            else Some(AvHeader("mp4", duration * 1000L / timescale, 0, 0, 0))
          }
        }
      }
    }
    None
  }

  /** Partition-wise header decode over payload columns: (id, format,
    * width, height), with NULLs for undecodable payloads. Same batch shape
    * as [[decodePartition]]; metadata-only downstream queries (resolution
    * histograms, format counts, aspect-ratio filters) never touch a codec. */
  def decodeImageMeta(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          parseImageHeader(payload) match {
            case Some(h) => (id, Option(h.format), Option(h.width), Option(h.height))
            case None    => (id, None: Option[String], None: Option[Int], None: Option[Int])
          }
        }
      }
      .toDF("id", "format", "width", "height")
  }

  /** Minimal valid PCM WAV header+descriptor bytes (no sample data beyond
    * the declared `data` chunk length) — the inverse of [[parseAvHeader]];
    * used to synthesize payload fixtures wherever real media can't ship
    * (specs, the m2 oracle battery entry). */
  def syntheticWav(rate: Int, channels: Int, bits: Int, dataLen: Int): Array[Byte] = {
    val byteRate = rate * channels * bits / 8
    val b = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate).putInt(byteRate)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    b.put("data".getBytes).putInt(dataLen)
    b.array()
  }

  // ---------------------------------------------------------------- pixels

  /** A decoded raster: dimensions plus row-major ARGB pixels (the JDK's
    * packed-int convention — bits 24-31 alpha, 16-23 red, 8-15 green,
    * 0-7 blue). */
  final case class PixelImage(width: Int, height: Int, argb: Array[Int])

  /** Encode a raster to PNG bytes with the JDK's built-in encoder. `rgb`
    * maps (x, y) → packed 0xRRGGBB. PNG is lossless, so
    * [[decodePixels]] of the result returns bit-identical pixel values —
    * the property the m3 oracle gate rests on. */
  def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Encode a raster to baseline JPEG bytes with the JDK's built-in
    * encoder — the MJPG frame payload (legacy MJPEG-in-AVI is JPEG bytes
    * per `00dc` chunk, so [[aviFrames]] + [[decodePixels]] cover it with
    * no codec library). JPEG is LOSSY: decode(encode(x)) approximates x,
    * so oracles over JPEG payloads assert BOUNDED decode error, never
    * exact sums (the m6 pattern — solid-color frames reconstruct within a
    * few counts per channel: DC-only blocks, quantization error ≤ q/16
    * per pixel plus YCbCr round-trip rounding). */
  def encodeJpeg(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** REAL pixel decode via `javax.imageio` (PNG/JPEG/GIF/BMP readers are
    * part of the JDK). Returns None for undecodable payloads — the same
    * reject-don't-crash contract as the header parsers. */
  def decodePixels(bytes: Array[Byte]): Option[PixelImage] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth; val h = img.getHeight
        // one bulk getRGB: converts any source raster (palette GIF, gray
        // PNG, ...) to packed sRGB ints — per-pixel getRGB calls would
        // re-resolve the color model every time
        Some(PixelImage(w, h, img.getRGB(0, 0, w, h, null, 0, w)))
      }
    } catch { case _: Exception => None }
  }

  /** Exact integer channel statistics of a decoded raster: per-channel
    * sums plus min/max of the ITU-R 601 integer luma
    * `(299 r + 587 g + 114 b) / 1000`. All exact in Long, so both engines
    * can agree bit-for-bit. */
  final case class PixelStats(
      nPixels: Long, rSum: Long, gSum: Long, bSum: Long,
      lumaMin: Int, lumaMax: Int)

  def pixelStats(img: PixelImage): PixelStats = {
    var rs = 0L; var gs = 0L; var bs = 0L
    var lmin = Int.MaxValue; var lmax = Int.MinValue
    var i = 0
    val px = img.argb
    while (i < px.length) {
      val p = px(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      rs += r; gs += g; bs += b
      val luma = (299 * r + 587 * g + 114 * b) / 1000
      if (luma < lmin) lmin = luma
      if (luma > lmax) lmax = luma
      i += 1
    }
    PixelStats(px.length.toLong, rs, gs, bs,
      if (px.length == 0) 0 else lmin, if (px.length == 0) 0 else lmax)
  }

  /** Integer box-filter downsample to (tw, th): target cell (tx, ty)
    * averages the source box [floor(tx·w/tw), floor((tx+1)·w/tw)) ×
    * [floor(ty·h/th), floor((ty+1)·h/th)), per channel, floor division.
    * Fully deterministic integer arithmetic — unlike Graphics2D's
    * platform-tunable interpolation — so thumbnails are reproducible
    * across JVMs and mirrorable in SQL. */
  def resizeBox(img: PixelImage, tw: Int, th: Int): PixelImage = {
    require(tw > 0 && th > 0 && tw <= img.width && th <= img.height,
      s"resizeBox: target ${tw}x$th must be within source ${img.width}x${img.height}")
    val out = new Array[Int](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * img.height / th; val y1 = (ty + 1) * img.height / th
      var tx = 0
      while (tx < tw) {
        val x0 = tx * img.width / tw; val x1 = (tx + 1) * img.width / tw
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.argb(y * img.width + x)
            rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        out(ty * tw + tx) = 0xff000000 |
          (((rs / n).toInt & 0xff) << 16) | (((gs / n).toInt & 0xff) << 8) |
          ((bs / n).toInt & 0xff)
        tx += 1
      }
      ty += 1
    }
    PixelImage(tw, th, out)
  }

  /** Partition-wise REAL pixel decode + exact stats: (id, width, height,
    * n_pixels, r_sum, g_sum, b_sum, luma_min, luma_max), NULLs for
    * undecodable payloads. Same batch shape as [[decodePartition]] — one
    * ImageIO pipeline per partition, payloads never shuffled. */
  def decodeImagePixelStats(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        System.setProperty("java.awt.headless", "true")
        rows.map { case (id, payload) =>
          decodePixels(payload) match {
            case Some(img) =>
              val s = pixelStats(img)
              (id, Option(img.width), Option(img.height), Option(s.nPixels),
                Option(s.rSum), Option(s.gSum), Option(s.bSum),
                Option(s.lumaMin), Option(s.lumaMax))
            case None =>
              (id, None: Option[Int], None: Option[Int], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Int], None: Option[Int])
          }
        }
      }
      .toDF("id", "width", "height", "n_pixels",
        "r_sum", "g_sum", "b_sum", "luma_min", "luma_max")
  }

  // ------------------------------------------------- metadata strip (PII)

  /** Append an ancillary PNG chunk (e.g. `tEXt` key/value, `tIME`) right
    * before IEND — the test/synthesis face of [[stripImageMetadata]];
    * real crawl images arrive with these already embedded. */
  def addPngChunk(png: Array[Byte], chunkType: String, data: Array[Byte]): Array[Byte] = {
    require(chunkType.length == 4, "PNG chunk type is 4 ASCII chars")
    val iend = pngChunks(png).collectFirst {
      case (t, start, _) if t == "IEND" => start
    }.getOrElse(throw new IllegalArgumentException("not a PNG (no IEND)"))
    val out = new java.io.ByteArrayOutputStream(png.length + data.length + 12)
    out.write(png, 0, iend)
    val b = java.nio.ByteBuffer.allocate(12 + data.length)
    b.putInt(data.length)
    val typeAndData = chunkType.getBytes("US-ASCII") ++ data
    b.put(typeAndData)
    val crc = new java.util.zip.CRC32()
    crc.update(typeAndData)
    b.putInt(crc.getValue.toInt)
    out.write(b.array())
    out.write(png, iend, png.length - iend)
    out.toByteArray
  }

  /** (type, startOffset, totalLength) of every chunk of a PNG stream;
    * empty for non-PNG/malformed input. */
  private def pngChunks(b: Array[Byte]): Seq[(String, Int, Int)] = {
    if (b == null || b.length < 16 ||
      (b(0) & 0xff) != 0x89 || b(1) != 'P' || b(2) != 'N' || b(3) != 'G')
      return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var p = 8
    while (p + 8 <= b.length) {
      val len = ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
        ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      // Long arithmetic: a corrupt length near Int.MaxValue would wrap
      // `p + 12 + len` negative and slip past an Int bounds check
      if (len < 0 || p.toLong + 12L + len > b.length) return out.toSeq
      val t = new String(b, p + 4, 4, "US-ASCII")
      out += ((t, p, 12 + len))
      p += 12 + len
      if (t == "IEND") return out.toSeq
    }
    out.toSeq
  }

  /** PNG chunk types that carry PIXELS rather than metadata — everything
    * else (tEXt/zTXt/iTXt comments, eXIf blobs, tIME stamps, pHYs, ...)
    * is the metadata a privacy pass strips. tRNS stays because it maps
    * palette/gray values to alpha, i.e. it IS pixel data. */
  private val PngPixelChunks = Set("IHDR", "PLTE", "tRNS", "IDAT", "IEND")

  /** Strip embedded metadata from an image payload — the image-side PII
    * scrub (EXIF blobs carry GPS positions, device serials, timestamps;
    * tEXt/COM comments carry authorship): PNG drops every chunk outside
    * [[PngPixelChunks]]; JPEG drops APP1-APP15 and COM segments (APP0
    * JFIF stays — decoders key on it). Pixel bytes are untouched — the
    * output decodes to the identical raster. None for malformed input or
    * formats without a byte-level walk here (strip-or-reject: a privacy
    * pass must never silently pass a format it didn't inspect). Returns
    * the input REFERENCE when nothing needed stripping. */
  /** APNG control/frame chunks: frames 2..N live in fdAT, so an animated
    * PNG is a container this scrub does NOT fully model — reject rather
    * than silently destroy frames. */
  private val ApngChunks = Set("acTL", "fcTL", "fdAT")

  def stripImageMetadata(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') {
      val chunks = pngChunks(bytes)
      if (chunks.isEmpty || chunks.last._1 != "IEND") return None
      if (chunks.exists(c => ApngChunks(c._1))) return None
      val drop = chunks.filterNot(c => PngPixelChunks(c._1))
      val iendEnd = chunks.last._2 + chunks.last._3
      // data appended AFTER IEND is the classic hiding place — it is
      // dropped by the rebuild, and its presence alone forces one
      if (drop.isEmpty && iendEnd == bytes.length) return Some(bytes)
      val out = new java.io.ByteArrayOutputStream(bytes.length)
      out.write(bytes, 0, 8)
      chunks.foreach { case (t, start, len) =>
        if (PngPixelChunks(t)) out.write(bytes, start, len)
      }
      Some(out.toByteArray)
    } else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      // JPEG: a FULL segment walk — before the first SOS, between
      // progressive scans (markers are legal there too), and after EOI
      // (motion-photo trailers) — dropping APP1-15 + COM everywhere.
      // Entropy-coded data after an SOS is scanned for the next true
      // marker (skipping stuffed FF 00 and RST0-7) and copied verbatim.
      // The output buffer allocates lazily: a clean payload returns by
      // REFERENCE with zero copies.
      val n = bytes.length
      var out: java.io.ByteArrayOutputStream = null
      def dropFrom(p: Int): Unit = if (out == null) {
        out = new java.io.ByteArrayOutputStream(n)
        out.write(bytes, 0, p)
      }
      def keep(from: Int, len: Int): Unit =
        if (out != null) out.write(bytes, from, len)
      var p = 2
      while (p + 1 < n) {
        if ((bytes(p) & 0xff) != 0xff) return None // desynced walk
        val marker = bytes(p + 1) & 0xff
        if (marker == 0xff) { // fill byte: keep, resync on the next FF
          keep(p, 1); p += 1
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          keep(p, 2); p += 2 // standalone markers carry no length
        } else if (marker == 0xd9) { // EOI: anything after it drops
          keep(p, 2); p += 2
          if (p < n) dropFrom(p)
          return Some(if (out == null) bytes else out.toByteArray)
        } else if (marker == 0xda) { // SOS: header, then entropy scan
          if (p + 3 >= n) return None
          val segLen = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
          if (segLen < 2 || p.toLong + 2 + segLen > n) return None
          keep(p, 2 + segLen)
          p += 2 + segLen
          val entStart = p
          var atMarker = false
          while (!atMarker && p < n) {
            if ((bytes(p) & 0xff) != 0xff || p + 1 >= n) p += 1
            else {
              val m2 = bytes(p + 1) & 0xff
              if (m2 == 0x00 || (m2 >= 0xd0 && m2 <= 0xd7)) p += 2
              else atMarker = true
            }
          }
          if (!atMarker) return None // ended inside entropy data — truncated
          keep(entStart, p - entStart)
        } else {
          if (p + 3 >= n) return None
          val segLen = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
          if (segLen < 2 || p.toLong + 2 + segLen > n) return None
          // APP0 (JFIF), APP2 (ICC color profile), and APP14 (the Adobe
          // color-transform flag — without it a transform=0 Adobe JPEG
          // decodes RGB as YCbCr, and CMYK/YCCK misdecode outright) are
          // DECODE-critical and stay; APP1 (EXIF/XMP — the GPS/serial
          // carrier), the other APPn, and COM comments drop
          val isMeta = (marker >= 0xe1 && marker <= 0xef &&
            marker != 0xe2 && marker != 0xee) || marker == 0xfe
          if (isMeta) dropFrom(p)
          else keep(p, 2 + segLen)
          p += 2 + segLen
        }
      }
      None // never reached EOI — malformed/truncated
    } else None
  }

  /** Append a RIFF chunk (e.g. a `LIST`/INFO tag block) to a WAV and
    * patch the RIFF size header — the test/synthesis face of
    * [[stripWavMetadata]]; real recordings arrive with these embedded. */
  def addWavChunk(wav: Array[Byte], chunkId: String, data: Array[Byte]): Array[Byte] = {
    require(chunkId.length == 4, "RIFF chunk id is 4 ASCII chars")
    require(wav.length >= 12 && tag(wav, 0) == "RIFF" && tag(wav, 8) == "WAVE",
      "not a WAV")
    val pad = data.length % 2
    val out = java.nio.ByteBuffer.allocate(wav.length + 8 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(wav)
    out.put(chunkId.getBytes("US-ASCII"))
    out.putInt(data.length)
    out.put(data)
    if (pad == 1) out.put(0.toByte)
    val b = out.array()
    val newSize = b.length - 8
    b(4) = (newSize & 0xff).toByte; b(5) = ((newSize >> 8) & 0xff).toByte
    b(6) = ((newSize >> 16) & 0xff).toByte; b(7) = ((newSize >> 24) & 0xff).toByte
    b
  }

  /** RIFF chunk types that carry the AUDIO rather than metadata —
    * everything else (LIST/INFO artist+software tags, id3, bext
    * broadcast metadata, cue sheets, ...) is what a privacy pass
    * strips. `fact` stays: it is structural (sample count). */
  private val WavKeepChunks = Set("fmt ", "data", "fact")

  /** WAV-side metadata strip, same contract as [[stripImageMetadata]]:
    * keep only [[WavKeepChunks]], drop LIST/id3/bext/... tags AND any
    * bytes beyond the declared RIFF extent (trailing hiding place), and
    * rewrite the RIFF size header to match. Sample bytes are untouched.
    * None for malformed/truncated input; the input REFERENCE comes back
    * when nothing needed stripping. */
  def stripWavMetadata(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 12) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    val riffEnd = 8L + le32(bytes, 4)
    if (riffEnd > bytes.length) return None // truncated vs its own header
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var p = 12L
    while (p + 8 <= riffEnd) {
      val id = tag(bytes, p.toInt)
      val size = le32(bytes, p.toInt + 4)
      val total = 8L + size + (size % 2)
      if (p + total > riffEnd) return None // chunk overruns its container
      chunks += ((id, p.toInt, total.toInt))
      p += total
    }
    if (p != riffEnd) return None // slack inside the declared extent
    val drop = chunks.exists(c => !WavKeepChunks(c._1))
    if (!drop && riffEnd == bytes.length) return Some(bytes)
    val kept = chunks.filter(c => WavKeepChunks(c._1))
    val newSize = 4 + kept.map(_._3).sum
    val out = java.nio.ByteBuffer.allocate(8 + newSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(newSize)
    out.put("WAVE".getBytes("US-ASCII"))
    kept.foreach { case (_, start, len) => out.put(bytes, start, len) }
    Some(out.array())
  }

  /** A JPEG marker segment (`FF mm len data`) — the writer face for
    * tests/synthesis, next to [[addPngChunk]]/[[addWavChunk]]. */
  def jpegSegment(marker: Int, data: Array[Byte]): Array[Byte] = {
    require(data.length + 2 <= 0xffff, "JPEG segment length is 16-bit")
    Array[Byte](0xff.toByte, marker.toByte,
      (((data.length + 2) >> 8) & 0xff).toByte,
      ((data.length + 2) & 0xff).toByte) ++ data
  }

  /** Container magic sniff — dispatch/labeling only (full validation is
    * the stripper's job): "png" / "jpeg" / "wav". */
  private def sniffFormat(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 12) None
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') Some("png")
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) Some("jpeg")
    else if (tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE") Some("wav")
    else None
  }

  /** One media-PII entry point: dispatch on the container magic — WAV to
    * [[stripWavMetadata]], images to [[stripImageMetadata]]; None for
    * anything neither inspects. */
  def stripMediaMetadata(bytes: Array[Byte]): Option[Array[Byte]] =
    if (sniffFormat(bytes).contains("wav")) stripWavMetadata(bytes)
    else stripImageMetadata(bytes)

  /** Partition-wise metadata strip over payload rows: (id, fmt, n_in,
    * n_out, meta_removed_bytes, payload). Rejected rows (malformed or
    * uninspected formats) carry NULL n_out/meta_removed AND a NULL
    * payload — the output column must never hold un-scrubbed bytes a
    * downstream consumer could ship by accident; rejoin on id when the
    * original is needed. Payloads are rewritten where they sit —
    * nothing but the row stream moves. */
  def stripMediaMetadataDf(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val fmt = sniffFormat(payload)
        val nIn = Option(payload).map(_.length.toLong) // null payloads flow
        stripMediaMetadata(payload) match {
          case Some(outB) =>
            (id, fmt, nIn, Option(outB.length.toLong),
              nIn.map(_ - outB.length), outB)
          case None =>
            (id, fmt, nIn, None: Option[Long], None: Option[Long],
              null: Array[Byte])
        }
      })
      .toDF("id", "fmt", "n_in", "n_out", "meta_removed_bytes", "payload")
  }

  // ------------------------------------------------- perceptual hash (dHash)

  /** dHash thumbnail geometry: 11×6 luma cells → 10 horizontal gradient
    * signs per row × 6 rows = 60 bits. 60 and not 64 for the same reason
    * as SimHash60/Winnow60/ZOrder60: the hash stays strictly positive in
    * a signed 64-bit lane, so the DuckDB oracle rebuilds it with plain
    * `<<` arithmetic on BIGINT. */
  val DHashW = 11
  val DHashH = 6

  /** 60-bit difference hash of a decoded raster: box-resize to the
    * [[DHashW]]×[[DHashH]] thumbnail ([[resizeBox]] — deterministic
    * integer arithmetic), take the ITU-R 601 integer luma of each cell,
    * and set bit `y·10 + x` iff `luma(x, y) > luma(x+1, y)`. Gradient
    * SIGNS are what survive re-encoding, uniform brightness shifts, and
    * rescaling — the point of a perceptual hash: the same content at an
    * exact multiple of the thumbnail size box-averages to the identical
    * thumbnail (Hamming 0), and a local pixel edit flips at most 2 bits
    * (the two comparisons that touch its cell). None for images smaller
    * than the thumbnail — there is nothing to average. */
  def dHash60(img: PixelImage): Option[Long] = {
    if (img.width < DHashW || img.height < DHashH) None
    else {
      val t =
        if (img.width == DHashW && img.height == DHashH) img
        else resizeBox(img, DHashW, DHashH)
      val luma = new Array[Int](DHashW * DHashH)
      var i = 0
      while (i < luma.length) {
        val p = t.argb(i)
        luma(i) = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
          114 * (p & 0xff)) / 1000
        i += 1
      }
      var h = 0L
      var y = 0
      while (y < DHashH) {
        var x = 0
        while (x < DHashW - 1) {
          if (luma(y * DHashW + x) > luma(y * DHashW + x + 1))
            h |= 1L << (y * (DHashW - 1) + x)
          x += 1
        }
        y += 1
      }
      Some(h)
    }
  }

  /** Partition-wise REAL decode → [[dHash60]] projection: (id, width,
    * height, dhash), NULLs where the payload doesn't decode or the image
    * is smaller than the thumbnail. Same batch shape as
    * [[decodeImagePixelStats]]: one ImageIO pipeline per partition,
    * payloads hashed where they sit and never shuffled. */
  def imageDHash(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        System.setProperty("java.awt.headless", "true")
        rows.map { case (id, payload) =>
          val img = decodePixels(payload)
          (id, img.map(_.width), img.map(_.height), img.flatMap(dHash60))
        }
      }
      .toDF("id", "width", "height", "dhash")
  }

  /** Image near-dup pairs over [[imageDHash]]: the 60-bit hash is split
    * into `maxHamming + 1` disjoint bit-range bands; a pair within
    * `maxHamming` differs in at most `maxHamming` bands, so at least one
    * band matches exactly (pigeonhole) — the band buckets are a LOSSLESS
    * candidate generator, and candidates are rescored with the exact
    * popcount. The multimodal sibling of the SimHash text near-dup, with
    * one structural difference: candidates are paired INSIDE the bucket
    * (group on the band key, explode in-bucket pairs) instead of a
    * banded self-join, because here the hash is an expensive per-row
    * decode (ImageIO) rather than a scan-speed projection — a self-join
    * would re-decode every image once per join side, the grouped form
    * decodes once and shuffles only 16-byte (id, dhash) structs.
    * Per-bucket work stays quadratic in the bucket only.
    * `maxHamming <= 5` keeps every band >= 10 bits so a band key still
    * partitions a corpus rather than funneling it into 2^few buckets.
    * Returns (id_a < id_b, dhash_a, dhash_b, hamming).
    *
    * @param maxBandFreq drop (band, bits) buckets larger than this before
    *                    pairing — the dHash twin of the SimHash
    *                    `maxBandFreq` cap. A corpus with a mass of
    *                    identical images (logos, spacer GIFs) concentrates
    *                    whole hashes, and one hot bucket makes the
    *                    in-bucket quadratic the job's whole cost; capped
    *                    buckets drop from CANDIDACY only (the standard
    *                    stop-bucket recall trade). None = keep all. */
  def imageNearDupPairs(
      df: DataFrame,
      idCol: String,
      maxHamming: Int = 3,
      maxBandFreq: Option[Int] = None
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 5,
      "maxHamming must be in [0, 5] — 6+ would shrink bands below 10 bits")
    val hashed = imageDHash(df, idCol)
      .filter(col("dhash").isNotNull)
      .select(col("id"), col("dhash"))
    bandedHamming60Pairs(hashed, hamming60BandKeys(maxHamming + 1),
      maxHamming, maxBandFreq)
  }

  /** The shared banded-Hamming pairing stage of [[imageNearDupPairs]] and
    * [[audioNearDupPairs]]: explode the band keys, bucket on (band, bits),
    * pair inside the bucket (sorted, id_a < id_b), dedup across bands,
    * rescore with the exact popcount. `hashed` is (id, dhash). */
  private def bandedHamming60Pairs(
      hashed: DataFrame,
      bandKeys: Seq[org.apache.spark.sql.Column],
      maxHamming: Int,
      maxBandFreq: Option[Int]
  ): DataFrame = {
    val banded = hashed
      .select(col("id"), col("dhash"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("id"), col("dhash"),
        col("bk.band").as("band"), col("bk.bits").as("bits"))
    val buckets = banded
      .groupBy("band", "bits")
      .agg(array_sort(collect_list(struct(col("id"), col("dhash")))).as("ms"))
      .filter(size(col("ms")).between(2, maxBandFreq.getOrElse(Int.MaxValue)))
    buckets
      .select(explode(expr(
        "flatten(transform(ms, (a, i) -> " +
          "transform(slice(ms, i + 2, size(ms) - i - 1), b -> " +
          "struct(a.id AS id_a, b.id AS id_b, " +
          "a.dhash AS dhash_a, b.dhash AS dhash_b))))")).as("p"))
      .select("p.*")
      .distinct()
      .withColumn("hamming",
        expr("bit_count(dhash_a ^ dhash_b)").cast("int"))
      .filter(col("hamming") <= maxHamming)
  }

  /** The shared maxHamming+1 disjoint-bit-range band keys of the 60-bit
    * perceptual hashes (pigeonhole: a pair within maxHamming leaves at
    * least one band untouched). */
  private def hamming60BandKeys(nb: Int): Seq[org.apache.spark.sql.Column] =
    (0 until nb).map { b =>
      val lo = b * 60 / nb
      val width = (b + 1) * 60 / nb - lo
      struct(lit(b).as("band"),
        shiftrightunsigned(col("dhash"), lo)
          .bitwiseAND(lit((1L << width) - 1)).as("bits"))
    }

  /** 60-bit envelope fingerprint of decoded PCM audio — the audio
    * sibling of [[dHash60]]: the sample stream (channel-interleaved, as
    * decoded) splits into 61 windows (window w covers samples
    * [⌊w·n/61⌋, ⌊(w+1)·n/61⌋) — the same floor-boundary scheme as
    * [[resizeBox]]), each window's energy is the exact integer sum of
    * |sample|, and bit w is the energy(w) > energy(w+1) gradient sign.
    * Energy-envelope SHAPE is what survives amplitude-preserving
    * resampling (duplicating every sample doubles every window's energy
    * when the window count divides both lengths — identical signs) and
    * small local edits (a one-window perturbation flips at most the two
    * comparisons touching it). None for streams shorter than 61 samples
    * — no envelope to compare. */
  def audioDHash60(pcm: PcmAudio): Option[Long] = {
    val s = pcm.samples
    val n = s.length
    if (n < 61) None
    else {
      val energy = new Array[Long](61)
      var w = 0
      while (w < 61) {
        // long multiply: w*n overflows Int past ~35M samples (a dozen
        // minutes of 44.1kHz mono), which would flip windows negative
        val i0 = (w.toLong * n / 61).toInt
        val i1 = ((w + 1).toLong * n / 61).toInt
        var e = 0L
        var i = i0
        while (i < i1) { e += math.abs(s(i).toLong); i += 1 }
        energy(w) = e
        w += 1
      }
      var h = 0L
      var b = 0
      while (b < 60) {
        if (energy(b) > energy(b + 1)) h |= 1L << b
        b += 1
      }
      Some(h)
    }
  }

  /** Partition-wise REAL PCM decode → [[audioDHash60]] projection:
    * (id, n_samples, dhash), NULLs where the payload doesn't decode or
    * is shorter than the envelope. Payloads never shuffle. */
  def audioDHash(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val pcm = decodePcm(payload)
        (id, pcm.map(_.samples.length), pcm.flatMap(audioDHash60))
      })
      .toDF("id", "n_samples", "dhash")
  }

  /** Banded Hamming matching of an incoming hash frame AGAINST a
    * reference hash frame — the incremental face of the perceptual
    * near-dup family, for both modalities (compose with [[imageDHash]] /
    * [[audioDHash]] upstream). Both inputs are (id, dhash). Returns
    * (in_id, ref_id, dhash_in, dhash_ref, hamming ≤ maxHamming).
    *
    * STREAM-COMPATIBLE by construction, mirroring the MinHash
    * incremental near-dup: the band join is stream-static (incoming
    * stream × broadcastable reference band table) and the only stateful
    * operator is the per-(in_id, ref_id) dedup aggregation — run in
    * update mode, state stays pair-sparse because banding is. The same
    * call on two batch frames is the batch backfill, so live and batch
    * share one definition. */
  def hammingPairsAgainstRef(
      in: DataFrame,
      ref: DataFrame,
      maxHamming: Int = 3
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 5,
      "maxHamming must be in [0, 5] — 6+ would shrink bands below 10 bits")
    val keys = hamming60BandKeys(maxHamming + 1)
    def banded(df: DataFrame, idName: String, hName: String): DataFrame =
      df.filter(col("dhash").isNotNull)
        .select(col("id"), col("dhash"), explode(array(keys: _*)).as("bk"))
        .select(col("id").as(idName), col("dhash").as(hName),
          col("bk.band").as("band"), col("bk.bits").as("bits"))
    banded(in, "in_id", "dhash_in")
      .join(banded(ref, "ref_id", "dhash_ref"), Seq("band", "bits"))
      .groupBy("in_id", "ref_id", "dhash_in", "dhash_ref")
      .agg(count(lit(1)).as("_nbands"))
      .drop("_nbands")
      .withColumn("hamming",
        expr("bit_count(dhash_in ^ dhash_ref)").cast("int"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Audio near-dup pairs over [[audioDHash]] — identical machinery to
    * [[imageNearDupPairs]] (banded pigeonhole candidates, in-bucket
    * pairing so the PCM decode runs once, popcount rescore, stop-bucket
    * cap); see there for the scale contract. */
  def audioNearDupPairs(
      df: DataFrame,
      idCol: String,
      maxHamming: Int = 3,
      maxBandFreq: Option[Int] = None
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 5,
      "maxHamming must be in [0, 5] — 6+ would shrink bands below 10 bits")
    val hashed = audioDHash(df, idCol)
      .filter(col("dhash").isNotNull)
      .select(col("id"), col("dhash"))
    bandedHamming60Pairs(hashed, hamming60BandKeys(maxHamming + 1),
      maxHamming, maxBandFreq)
  }

  // ------------------------------------------------------------------ PCM

  /** A minimal PCM WAV with REAL sample data (16-bit little-endian),
    * interleaved if `channels` > 1 — the payload side of the lossless
    * encode→decode property [[decodePcm]] closes. */
  def syntheticWavPcm(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = rate * channels * 2
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate).putInt(byteRate)
      .putShort((channels * 2).toShort).putShort(16.toShort)
    b.put("data".getBytes).putInt(dataLen)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  /** Decoded PCM audio: header fields plus every sample as a signed Int
    * (16-bit: as stored; 8-bit WAV is unsigned-biased on disk and is
    * rebased to signed −128..127 here). */
  final case class PcmAudio(
      sampleRate: Int, channels: Int, bitsPerSample: Int, samples: Array[Int])

  /** REAL audio-sample decode for PCM WAV (format tag 1, 8 or 16 bits).
    * Hand-parsed — PCM needs no codec — and lossless, so integer sample
    * statistics are exact. None for non-PCM or malformed payloads. */
  def decodePcm(bytes: Array[Byte]): Option[PcmAudio] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var o = 12
    var fmtTag = -1; var rate = 0L; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0L
    while (o + 8 <= bytes.length) {
      val id = tag(bytes, o); val len = le32(bytes, o + 4)
      if (id == "fmt " && o + 8 + 16 <= bytes.length) {
        fmtTag = le16(bytes, o + 8)
        channels = le16(bytes, o + 10)
        rate = le32(bytes, o + 12)
        bits = le16(bytes, o + 22)
      } else if (id == "data") {
        dataOff = o + 8; dataLen = len
      }
      val next = o.toLong + 8L + len + (len & 1L)
      if (next > Int.MaxValue) return None
      o = next.toInt
    }
    if (fmtTag != 1 || rate <= 0 || rate > Int.MaxValue || channels <= 0 ||
      (bits != 8 && bits != 16) || dataOff < 0) return None
    // clamp to the bytes actually present: a truncated object-store read
    // yields the prefix samples, not a crash
    val avail = math.min(dataLen, (bytes.length - dataOff).toLong)
    val n = (avail / (bits / 8)).toInt
    val out = new Array[Int](n)
    var i = 0
    if (bits == 16) {
      while (i < n) { out(i) = le16(bytes, dataOff + 2 * i).toShort.toInt; i += 1 }
    } else {
      while (i < n) { out(i) = (bytes(dataOff + i) & 0xff) - 128; i += 1 }
    }
    Some(PcmAudio(rate.toInt, channels, bits, out))
  }

  /** Partition-wise REAL PCM decode + exact integer sample stats:
    * (id, sample_rate, channels, n_samples, pcm_sum, pcm_abs_sum,
    * pcm_min, pcm_max), NULLs for undecodable/non-PCM payloads. */
  def decodeAudioStats(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          decodePcm(payload) match {
            case Some(a) =>
              var s = 0L; var as = 0L
              var mn = Int.MaxValue; var mx = Int.MinValue
              var i = 0
              while (i < a.samples.length) {
                val v = a.samples(i)
                s += v; as += math.abs(v)
                if (v < mn) mn = v
                if (v > mx) mx = v
                i += 1
              }
              val n = a.samples.length
              (id, Option(a.sampleRate), Option(a.channels), Option(n.toLong),
                Option(s), Option(as),
                Option(if (n == 0) 0 else mn), Option(if (n == 0) 0 else mx))
            case None =>
              (id, None: Option[Int], None: Option[Int], None: Option[Long],
                None: Option[Long], None: Option[Long],
                None: Option[Int], None: Option[Int])
          }
        }
      }
      .toDF("id", "sample_rate", "channels", "n_samples",
        "pcm_sum", "pcm_abs_sum", "pcm_min", "pcm_max")
  }

  // ------------------------------------------------------------- video

  /** A minimal AVI (RIFF) container holding the given encoded frames as
    * `00dc` chunks inside the `movi` LIST — the MPNG-codec shape (PNG
    * bytes per frame), which [[aviFrames]] + [[decodePixels]] can
    * round-trip LOSSLESSLY with no codec library. No hdrl LIST is
    * written (the frame walk doesn't need one). */
  def syntheticAviPng(frames: Seq[Array[Byte]]): Array[Byte] = {
    val framesLen = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val moviLen = 4 + framesLen // 'movi' + chunks
    val riffLen = 4 + 8 + moviLen // 'AVI ' + LIST header + movi
    val b = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(riffLen).put("AVI ".getBytes)
    b.put("LIST".getBytes).putInt(moviLen).put("movi".getBytes)
    frames.foreach { f =>
      b.put("00dc".getBytes).putInt(f.length).put(f)
      if ((f.length & 1) == 1) b.put(0.toByte) // RIFF word alignment
    }
    b.array()
  }

  /** REAL video-container frame walk: the encoded payload of every
    * `##db`/`##dc` chunk inside an AVI's `movi` LIST, in stream order.
    * Codec-agnostic — the bytes are whatever the stream's codec wrote
    * (PNG for MPNG, JPEG for MJPG — both of which [[decodePixels]] can
    * then decode with the JDK alone). None for non-AVI/malformed
    * payloads; a truncated tail yields the complete prefix frames. */
  def aviFrames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes == null || bytes.length < 12) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return None
    val out = Seq.newBuilder[Array[Byte]]
    var o = 12
    var found = false
    while (o + 8 <= bytes.length) {
      val id = tag(bytes, o); val len = le32(bytes, o + 4)
      if (id == "LIST" && o + 12 <= bytes.length && tag(bytes, o + 8) == "movi") {
        found = true
        var fo = o + 12
        val end = math.min(o + 8 + len, bytes.length.toLong).toInt
        var ok = true
        while (ok && fo + 8 <= end) {
          val fid = tag(bytes, fo); val flen = le32(bytes, fo + 4)
          val fend = fo.toLong + 8 + flen
          if (fend > end) ok = false // truncated frame: keep the prefix
          else {
            if (fid.length == 4 && fid(0).isDigit && fid(1).isDigit &&
              (fid.substring(2) == "db" || fid.substring(2) == "dc"))
              out += java.util.Arrays.copyOfRange(bytes, fo + 8, (fo + 8 + flen.toInt))
            val next = fend + (flen & 1L)
            if (next > Int.MaxValue) ok = false else fo = next.toInt
          }
        }
      }
      val next = o.toLong + 8L + len + (len & 1L)
      if (next > Int.MaxValue) return if (found) Some(out.result()) else None
      o = next.toInt
    }
    if (found) Some(out.result()) else None
  }

  /** Partition-wise frame-sample + decode: every `step`-th frame of each
    * AVI payload decoded through [[decodePixels]], with exact integer
    * channel sums aggregated across the SAMPLED frames. The per-row unit
    * a 100 TB video-feature pass has: containers decoded where they sit,
    * one decoder pipeline per partition, only fixed-width stats emitted.
    * Returns (id, n_frames, n_sampled, r_sum, g_sum, b_sum); NULLs for
    * non-AVI payloads, and frames that fail pixel decode are skipped
    * from the sums (n_sampled counts decoded frames only). */
  def sampleVideoFrames(df: DataFrame, idCol: String, step: Int): DataFrame = {
    require(step >= 1, "step must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        System.setProperty("java.awt.headless", "true")
        rows.map { case (id, payload) =>
          aviFrames(payload) match {
            case Some(frames) =>
              var rs = 0L; var gs = 0L; var bs = 0L; var sampled = 0L
              // one-entry decode memo (r20 opt, guide §1.2 per-task work):
              // MJPEG streams repeat byte-identical frames across static
              // scenes, and decode is deterministic on the bytes — a
              // repeated frame reuses the previous frame's stats instead
              // of paying ImageIO's per-call reader/stream setup again.
              // Failures memoize too (same bytes fail the same way).
              var memoBytes: Array[Byte] = null
              var memoStats: Option[PixelStats] = None
              var i = 0
              while (i < frames.length) {
                val fb = frames(i)
                val st =
                  if (memoBytes != null && java.util.Arrays.equals(memoBytes, fb))
                    memoStats
                  else {
                    memoStats = decodePixels(fb).map(pixelStats)
                    memoBytes = fb
                    memoStats
                  }
                st.foreach { s =>
                  rs += s.rSum; gs += s.gSum; bs += s.bSum; sampled += 1
                }
                i += step
              }
              (id, Option(frames.length.toLong), Option(sampled),
                Option(rs), Option(gs), Option(bs))
            case None =>
              (id, None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF("id", "n_frames", "n_sampled", "r_sum", "g_sum", "b_sum")
  }

  /** Partition-wise scene-cut detection: every frame of each AVI payload
    * pixel-decoded in sequence, consecutive frames compared by mean
    * absolute per-pixel channel difference (summed over R+G+B), and a
    * CUT flagged where that mean clears `threshold` — the keyframe/
    * shot-boundary pass a video-training pipeline runs to pick one
    * representative frame per shot. The threshold lives far above codec
    * noise (MJPEG DC quantization wobbles a solid block a few counts;
    * real cuts move whole channels), which is what makes the count
    * adjudicable over lossy frames.
    *
    * Returns (id, n_frames, n_compared, n_cuts, first_cut) — first_cut
    * is the 1-based index of the first frame that OPENS a new shot, -1
    * when no cut; NULLs for non-AVI payloads. Frames that fail pixel
    * decode or differ in dimensions from their predecessor are skipped
    * from comparisons (n_compared counts the pairs actually diffed).
    *
    * Same scale unit as [[sampleVideoFrames]]: one decoder walk per
    * payload where it sits, two frames of pixels live at a time, only
    * fixed-width counters emitted — no shuffle, no pixel egress. */
  def videoCutDetect(df: DataFrame, idCol: String, threshold: Double): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        System.setProperty("java.awt.headless", "true")
        rows.map { case (id, payload) =>
          aviFrames(payload) match {
            case Some(frames) =>
              var prev: Option[PixelImage] = None
              var compared = 0L; var cuts = 0L; var firstCut = -1L
              // one-entry decode memo (r20 opt — see sampleVideoFrames):
              // byte-identical repeated frames (static shots) reuse the
              // previous decode; the diff loop still runs, so the
              // compared/cut counters are untouched by construction
              var memoBytes: Array[Byte] = null
              var memoImg: Option[PixelImage] = None
              def decodeMemo(fb: Array[Byte]): Option[PixelImage] =
                if (memoBytes != null && java.util.Arrays.equals(memoBytes, fb))
                  memoImg
                else {
                  memoImg = decodePixels(fb)
                  memoBytes = fb
                  memoImg
                }
              var i = 0
              while (i < frames.length) {
                decodeMemo(frames(i)).foreach { img =>
                  prev match {
                    case Some(p) if p.width == img.width && p.height == img.height =>
                      compared += 1
                      var diff = 0L
                      var j = 0
                      val a = p.argb; val b = img.argb
                      while (j < a.length) {
                        val x = a(j); val y = b(j)
                        diff += math.abs(((x >> 16) & 0xff) - ((y >> 16) & 0xff)) +
                          math.abs(((x >> 8) & 0xff) - ((y >> 8) & 0xff)) +
                          math.abs((x & 0xff) - (y & 0xff))
                        j += 1
                      }
                      if (diff.toDouble / a.length > threshold) {
                        cuts += 1
                        if (firstCut < 0) firstCut = i + 1L // 1-based opener
                      }
                    case _ => ()
                  }
                  prev = Some(img)
                }
                i += 1
              }
              (id, Option(frames.length.toLong), Option(compared),
                Option(cuts), Option(firstCut))
            case None =>
              (id, None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF("id", "n_frames", "n_compared", "n_cuts", "first_cut")
  }

  /** Partition-wise audio/video header decode: (id, format, duration_ms,
    * sample_rate, channels), NULLs for undecodable payloads. */
  def decodeAvMeta(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          parseAvHeader(payload) match {
            case Some(h) =>
              (id, Option(h.format), Option(h.durationMs),
                Option(h.sampleRate), Option(h.channels))
            case None =>
              (id, None: Option[String], None: Option[Long],
                None: Option[Int], None: Option[Int])
          }
        }
      }
      .toDF("id", "format", "duration_ms", "sample_rate", "channels")
  }
}
