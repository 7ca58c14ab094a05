package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{PixelImage, PcmAudio}

/** The REAL (JDK-only) pixel and PCM decode paths: lossless encode→decode
  * round-trips, hand-computed stat fixtures, deterministic integer resize,
  * and the reject-don't-crash contract for corrupt payloads. */
class MultimodalPixelSpec extends SparkSpec {

  private def rgb(r: Int, g: Int, b: Int): Int = (r << 16) | (g << 8) | b

  test("PNG encode→decodePixels round-trips every pixel bit-exactly") {
    // 4x3 with all-distinct channel values, including 0 and 255 extremes
    val pat = Array(
      rgb(0, 0, 0),       rgb(255, 255, 255), rgb(1, 2, 3),     rgb(250, 100, 7),
      rgb(13, 200, 90),   rgb(80, 0, 255),    rgb(255, 0, 0),   rgb(0, 255, 0),
      rgb(0, 0, 255),     rgb(128, 64, 32),   rgb(17, 18, 19),  rgb(200, 201, 202))
    val bytes = Multimodal.encodePng(4, 3, (x, y) => pat(y * 4 + x))
    val img = Multimodal.decodePixels(bytes).get
    assert(img.width === 4 && img.height === 3)
    assert(img.argb.map(_ & 0xffffff).toSeq === pat.toSeq)
  }

  test("pixelStats matches a hand-computed 2x2 fixture") {
    val img = PixelImage(2, 2, Array(
      0xff000000 | rgb(10, 20, 30), 0xff000000 | rgb(255, 0, 0),
      0xff000000 | rgb(0, 255, 0), 0xff000000 | rgb(0, 0, 255)))
    val s = Multimodal.pixelStats(img)
    assert(s.nPixels === 4L)
    assert(s.rSum === 10L + 255)
    assert(s.gSum === 20L + 255)
    assert(s.bSum === 30L + 255)
    // lumas: (2990+11740+3420)/1000=18; 299*255/1000=76; 587*255/1000=149;
    // 114*255/1000=29
    assert(s.lumaMin === 18)
    assert(s.lumaMax === 149)
  }

  test("resizeBox is the exact integer box average, divisible and not") {
    // 4x2 -> 2x1: each target pixel averages a 2x2 box
    val img = PixelImage(4, 2, Array(
      rgb(10, 0, 0), rgb(20, 0, 0), rgb(100, 4, 0), rgb(101, 5, 0),
      rgb(30, 0, 0), rgb(40, 0, 0), rgb(102, 6, 0), rgb(103, 7, 0)))
    val t = Multimodal.resizeBox(img, 2, 1)
    assert(((t.argb(0) >> 16) & 0xff) === (10 + 20 + 30 + 40) / 4)
    assert(((t.argb(1) >> 16) & 0xff) === (100 + 101 + 102 + 103) / 4)
    assert(((t.argb(1) >> 8) & 0xff) === (4 + 5 + 6 + 7) / 4)
    // 3x3 -> 2x2: uneven boxes — x boxes [0,1) and [1,3), floor division
    val g = PixelImage(3, 3, Array.tabulate(9)(i => rgb(i * 10, 0, 0)))
    val u = Multimodal.resizeBox(g, 2, 2)
    // target (0,0): x in [0,1), y in [0,1) -> pixel 0 = 0
    assert(((u.argb(0) >> 16) & 0xff) === 0)
    // target (1,1): x in [1,3), y in [1,3) -> pixels 40,50,70,80 -> 60
    assert(((u.argb(3) >> 16) & 0xff) === 60)
  }

  test("GIF and BMP payloads decode through the same path") {
    // both JDK writers are lossless for <=256-color content
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5) img.setRGB(x, y, rgb(x * 40, y * 60, 128))
    val expected =
      (0 until 4).flatMap(y => (0 until 5).map(x => rgb(x * 40, y * 60, 128)))
    val bmpOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bmpOut)
    val bmp = Multimodal.decodePixels(bmpOut.toByteArray).get
    assert(bmp.width === 5 && bmp.height === 4)
    assert(bmp.argb.map(_ & 0xffffff).toSeq === expected)
    // GIF must be written NON-interlaced: the JDK's own reader mangles
    // interlaced GIFs shorter than 8 rows (first interlace pass covers
    // row 0 only, later passes land off-by-one — rows drop/duplicate)
    val gifOut = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(gifOut)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    val gif = Multimodal.decodePixels(gifOut.toByteArray).get
    assert(gif.width === 5 && gif.height === 4)
    assert(gif.argb.map(_ & 0xffffff).toSeq === expected)
  }

  test("JPEG decodes with exact dimensions and approximate pixels") {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgb(120, 130, 140))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val dec = Multimodal.decodePixels(out.toByteArray).get
    assert(dec.width === 16 && dec.height === 16)
    val s = Multimodal.pixelStats(dec)
    // lossy: the flat color must survive within a small band
    assert(math.abs(s.rSum / 256.0 - 120) < 8)
    assert(math.abs(s.gSum / 256.0 - 130) < 8)
  }

  test("decodePixels rejects corrupt and non-image payloads") {
    assert(Multimodal.decodePixels(null) === None)
    assert(Multimodal.decodePixels(Array.emptyByteArray) === None)
    assert(Multimodal.decodePixels("not an image at all".getBytes) === None)
    val good = Multimodal.encodePng(4, 4, (_, _) => 0x808080)
    assert(Multimodal.decodePixels(good.take(20)) === None) // truncated
  }

  test("WAV PCM 16-bit encode→decodePcm round-trips every sample") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345, 7)
    val bytes = Multimodal.syntheticWavPcm(16000, 2, samples)
    val a = Multimodal.decodePcm(bytes).get
    assert(a.sampleRate === 16000 && a.channels === 2 && a.bitsPerSample === 16)
    assert(a.samples.toSeq === samples.map(_.toInt).toSeq)
  }

  test("8-bit WAV samples rebase from unsigned storage to signed") {
    // hand-build: 8-bit PCM stores 0..255 with 128 = silence
    val data = Array[Int](0, 128, 255, 200).map(_.toByte)
    val b = java.nio.ByteBuffer.allocate(44 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + 4).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
    b.put("data".getBytes).putInt(4).put(data)
    val a = Multimodal.decodePcm(b.array()).get
    assert(a.bitsPerSample === 8)
    assert(a.samples.toSeq === Seq(-128, 0, 127, 72))
  }

  test("decodePcm rejects non-PCM and malformed; truncation yields prefix") {
    val good = Multimodal.syntheticWavPcm(8000, 1, Array[Short](5, 6, 7, 8))
    // flip the fmt tag to 3 (IEEE float) -> not PCM
    val nonPcm = good.clone(); nonPcm(20) = 3
    assert(Multimodal.decodePcm(nonPcm) === None)
    assert(Multimodal.decodePcm("RIFFxxxxJUNK".getBytes) === None)
    // truncated mid-data: the available prefix decodes, no crash
    val trunc = Multimodal.decodePcm(good.dropRight(4)).get
    assert(trunc.samples.toSeq === Seq(5, 6))
  }

  test("AVI frame walk round-trips PNG frames and tolerates truncation") {
    val frames = Seq(
      Multimodal.encodePng(2, 2, (_, _) => rgb(10, 20, 30)),
      Multimodal.encodePng(2, 2, (_, _) => rgb(40, 50, 60)),
      Multimodal.encodePng(2, 2, (_, _) => rgb(70, 80, 90)))
    val avi = Multimodal.syntheticAviPng(frames)
    val back = Multimodal.aviFrames(avi).get
    assert(back.length === 3)
    back.zip(frames).foreach { case (b, f) => assert(b.toSeq === f.toSeq) }
    // each extracted frame decodes losslessly through the pixel path
    val img = Multimodal.decodePixels(back(1)).get
    assert((img.argb(0) & 0xffffff) === rgb(40, 50, 60))
    // truncated mid-frame: the complete prefix survives, no crash
    val trunc = Multimodal.aviFrames(avi.dropRight(10)).get
    assert(trunc.length === 2)
    // non-AVI payloads reject
    assert(Multimodal.aviFrames("RIFFxxxxWAVE".getBytes) === None)
    assert(Multimodal.aviFrames(frames(0)) === None)
  }

  test("sampleVideoFrames takes every k-th frame with exact sums") {
    import spark.implicits._
    val frames = (0 until 5).map(f =>
      Multimodal.encodePng(2, 2, (_, _) => rgb(f * 10, 0, 0)))
    val in = Seq((1L, Multimodal.syntheticAviPng(frames)),
      (2L, "not a video".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.sampleVideoFrames(in, "doc_id", step = 2)
      .orderBy("id").collect()
    val r = out(0)
    assert(r.getLong(1) === 5L && r.getLong(2) === 3L)
    // frames 0, 2, 4 sampled: r channel sums 4 px each of 0, 20, 40
    assert(r.getLong(3) === 4L * (0 + 20 + 40))
    assert(out(1).isNullAt(1))
  }

  test("decodeImagePixelStats emits stats for good payloads, NULLs for bad") {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.encodePng(3, 2, (x, y) => rgb(x + y, 2 * x, 10))),
      (2L, "garbage".getBytes))
    val in = rows.toDF("doc_id", "payload")
    val out = Multimodal.decodeImagePixelStats(in, "doc_id")
      .orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getInt(1) === 3 && r1.getInt(2) === 2 && r1.getLong(3) === 6L)
    // r channel: x+y over 3x2 = 0+1+2+1+2+3 = 9; g: 2x = 0+2+4 twice = 12
    assert(r1.getLong(4) === 9L && r1.getLong(5) === 12L && r1.getLong(6) === 60L)
    assert(out(1).isNullAt(1) && out(1).isNullAt(3))
  }

  test("decodeAudioStats matches hand stats and NULLs undecodables") {
    import spark.implicits._
    val in = Seq(
      (1L, Multimodal.syntheticWavPcm(8000, 1, Array[Short](10, -20, 30))),
      (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val out = Multimodal.decodeAudioStats(in, "doc_id").orderBy("id").collect()
    val r = out(0)
    assert(r.getInt(1) === 8000 && r.getInt(2) === 1 && r.getLong(3) === 3L)
    assert(r.getLong(4) === 20L && r.getLong(5) === 60L)
    assert(r.getInt(6) === -20 && r.getInt(7) === 30)
    assert(out(1).isNullAt(3))
  }

  // ---- metadata strip (PII) -------------------------------------------

  test("stripImageMetadata: PNG drops exactly the ancillary chunks, pixels intact") {
    val png = Multimodal.encodePng(5, 4, (x, y) => rgb(x * 30, y * 40, 7))
    val dirty = Multimodal.addPngChunk(
      Multimodal.addPngChunk(png, "tEXt", "Author secret".getBytes("US-ASCII")),
      "tIME", Array.fill[Byte](7)(1))
    val clean = Multimodal.stripImageMetadata(dirty).get
    // exactly the two spliced chunks (12B framing each) disappear
    assert(dirty.length - clean.length === (12 + 13) + (12 + 7))
    assert(!new String(clean, "ISO-8859-1").contains("secret"))
    // raster identical (PNG is lossless)
    val a = Multimodal.decodePixels(png).get
    val b = Multimodal.decodePixels(clean).get
    assert(a.argb.toSeq === b.argb.toSeq)
    // nothing left to strip: the clean payload comes back by REFERENCE
    assert(Multimodal.stripImageMetadata(clean).get eq clean)
  }

  test("stripImageMetadata: JPEG drops APP1/COM, keeps APP0, decodes the same") {
    val base = Multimodal.encodeJpeg(8, 8, (_, _) => rgb(200, 100, 50))
    val dirty = base.take(2) ++
      Multimodal.jpegSegment(0xe1, "Exif gps-here".getBytes("US-ASCII")) ++
      Multimodal.jpegSegment(0xfe, "a comment".getBytes("US-ASCII")) ++ base.drop(2)
    val clean = Multimodal.stripImageMetadata(dirty).get
    // the strip restores the encoder's exact byte stream (APP0 kept)
    assert(clean.toSeq === base.toSeq)
    assert(Multimodal.decodePixels(clean).isDefined)
    // a clean JPEG passes through by reference
    assert(Multimodal.stripImageMetadata(base).get eq base)
  }

  test("stripImageMetadata: trailing bytes and between-scan/after-EOI JPEG metadata drop") {
    val png = Multimodal.encodePng(5, 4, (x, y) => rgb(x * 30, y * 40, 7))
    // data appended after IEND (the classic hiding place) forces a rebuild
    val pngTrailed = png ++ "hidden gps blob".getBytes("US-ASCII")
    assert(Multimodal.stripImageMetadata(pngTrailed).get.toSeq === png.toSeq)
    val base = Multimodal.encodeJpeg(8, 8, (_, _) => rgb(200, 100, 50))
    assert((base(base.length - 2) & 0xff) === 0xff &&
      (base.last & 0xff) === 0xd9) // sanity: encoder ends with EOI
    // a COM between the entropy data and EOI (legal mid-stream metadata)
    val midCom = base.dropRight(2) ++
      Multimodal.jpegSegment(0xfe, "late comment".getBytes("US-ASCII")) ++ base.takeRight(2)
    assert(Multimodal.stripImageMetadata(midCom).get.toSeq === base.toSeq)
    // a motion-photo-style trailer after EOI drops
    val trailed = base ++ "embedded video bytes".getBytes("US-ASCII")
    assert(Multimodal.stripImageMetadata(trailed).get.toSeq === base.toSeq)
  }

  test("stripImageMetadata keeps decode-critical APP2/APP14, drops the rest") {
    val base = Multimodal.encodeJpeg(8, 8, (_, _) => rgb(90, 90, 90))
    val icc = Multimodal.jpegSegment(0xe2,
      "ICC_PROFILE".getBytes("US-ASCII") ++ Array.fill[Byte](8)(3))
    val adobe = Multimodal.jpegSegment(0xee,
      "Adobe".getBytes("US-ASCII") ++ Array[Byte](0, 100, 0, 0, 0, 0, 0))
    val exif = Multimodal.jpegSegment(0xe1, "Exif gps".getBytes("US-ASCII"))
    val dirty = base.take(2) ++ icc ++ adobe ++ exif ++ base.drop(2)
    val clean = Multimodal.stripImageMetadata(dirty).get
    // only the EXIF segment drops; the color-critical segments survive
    assert(clean.toSeq === (base.take(2) ++ icc ++ adobe ++ base.drop(2)).toSeq)
  }

  test("stripMediaMetadataDf NULLs rejected rows' payloads and metrics") {
    import spark.implicits._
    val in = Seq(
      (1L, Multimodal.encodePng(11, 6, (x, _) => rgb(x, x, x))),
      (2L, "garbage".getBytes("UTF-8")),
      (3L, null: Array[Byte])).toDF("doc_id", "payload")
    val out = Multimodal.stripMediaMetadataDf(in, "doc_id")
      .orderBy("id").collect()
    assert(out(0).getLong(3) > 0) // the PNG strips to a real payload
    // rejected rows must NOT carry the original bytes in the scrubbed
    // column — NULL payload, NULL metrics
    assert(out(1).isNullAt(3) && out(1).isNullAt(5))
    assert(out(2).isNullAt(2) && out(2).isNullAt(5))
  }

  test("stripImageMetadata rejects APNG rather than destroying frames") {
    val png = Multimodal.encodePng(5, 4, (x, y) => rgb(x, y, 7))
    val apng = Multimodal.addPngChunk(png, "acTL",
      Array[Byte](0, 0, 0, 2, 0, 0, 0, 0))
    assert(Multimodal.stripImageMetadata(apng).isEmpty)
  }

  test("stripWavMetadata: LIST tags and trailers drop, samples bit-identical") {
    val wav = Multimodal.syntheticWavPcm(8000, 1, Array[Short](10, -20, 30, 1000))
    val artist = "IART".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "secret".getBytes("US-ASCII")
    val dirty = Multimodal.addWavChunk(wav, "LIST",
      "INFO".getBytes("US-ASCII") ++ artist)
    val clean = Multimodal.stripWavMetadata(dirty).get
    assert(dirty.length - clean.length === 8 + 4 + 8 + 6) // LIST frame + INFO + IART
    assert(!new String(clean, "ISO-8859-1").contains("secret"))
    assert(Multimodal.decodePcm(clean).get.samples.toSeq ===
      Multimodal.decodePcm(wav).get.samples.toSeq)
    // clean file passes through by reference; stripped result is clean
    assert(Multimodal.stripWavMetadata(wav).get eq wav)
    assert(Multimodal.stripWavMetadata(clean).get eq clean)
    // trailing bytes beyond the RIFF extent drop
    val trailed = wav ++ "gps trail".getBytes("US-ASCII")
    assert(Multimodal.stripWavMetadata(trailed).get.toSeq === wav.toSeq)
    // truncation vs the RIFF header rejects, as does a lying chunk size
    assert(Multimodal.stripWavMetadata(wav.dropRight(5)).isEmpty)
    val lying = wav.clone()
    lying(40) = 0x7f.toByte // data chunk size low byte -> overruns
    assert(Multimodal.stripWavMetadata(lying).isEmpty)
    // dispatch: the combined entry point routes WAV correctly
    assert(Multimodal.stripMediaMetadata(dirty).get.toSeq === clean.toSeq)
  }

  test("stripImageMetadata rejects garbage, unhandled formats, lying lengths") {
    assert(Multimodal.stripImageMetadata("garbage".getBytes).isEmpty)
    assert(Multimodal.stripImageMetadata(null).isEmpty)
    // GIF is inspectable but has no byte-level walk here -> reject, never
    // silently pass a format the scrub didn't inspect
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](2, 0, 2, 0, 0, 0, 0, 0x3b)
    assert(Multimodal.stripImageMetadata(gif).isEmpty)
    // a JPEG segment length past the buffer must reject, not overrun
    // (0x7f00 = 32512 bytes claimed, far beyond the payload)
    val base = Multimodal.encodeJpeg(8, 8, (_, _) => rgb(1, 2, 3))
    val lying = base.take(2) ++
      Array[Byte](0xff.toByte, 0xe1.toByte, 0x7f, 0x00) ++ base.drop(2)
    assert(Multimodal.stripImageMetadata(lying).isEmpty)
    // a PNG chunk length near Int.MaxValue must reject via the Long-safe
    // bounds check, not wrap negative and crash
    val png = Multimodal.encodePng(5, 4, (x, y) => rgb(x, y, 9))
    val bigLen = png.clone()
    bigLen(8) = 0x7f.toByte; bigLen(9) = 0xff.toByte
    bigLen(10) = 0xff.toByte; bigLen(11) = 0xf4.toByte
    assert(Multimodal.stripImageMetadata(bigLen).isEmpty)
  }

  // ---- dHash60 / image near-dup --------------------------------------

  private def grayPng(w: Int, h: Int, luma: (Int, Int) => Int): Array[Byte] =
    Multimodal.encodePng(w, h, (x, y) => { val l = luma(x, y); rgb(l, l, l) })

  /** An 11×6 grayscale PNG whose dHash60 has EXACTLY the given bits: per
    * row, each set bit steps the luma down by 1 (left > right), each
    * clear bit holds it flat (equal → not >). Values stay in [20, 30]. */
  private def imgOfBits(bits: Set[Int]): Array[Byte] = {
    val luma = Array.ofDim[Int](6, 11)
    for (y <- 0 until 6) {
      luma(y)(0) = 30
      for (x <- 0 until 10)
        luma(y)(x + 1) = luma(y)(x) - (if (bits(y * 10 + x)) 1 else 0)
    }
    grayPng(11, 6, (x, y) => luma(y)(x))
  }

  test("dHash60: monotone gradients and a single bump, hand-computed") {
    // strictly increasing luma: no left>right anywhere -> all bits clear
    val inc = Multimodal.decodePixels(grayPng(11, 6, (x, _) => 20 + x)).get
    assert(Multimodal.dHash60(inc) === Some(0L))
    // strictly decreasing: every comparison true -> all 60 bits set
    val dec = Multimodal.decodePixels(grayPng(11, 6, (x, _) => 30 - x)).get
    assert(Multimodal.dHash60(dec) === Some((1L << 60) - 1))
    // flat except a bump at (x=3, y=2): only x=3>x=4 fires -> bit 23
    val bump = Multimodal.decodePixels(
      grayPng(11, 6, (x, y) => if (x == 3 && y == 2) 5 else 0)).get
    assert(Multimodal.dHash60(bump) === Some(1L << 23))
    // the bit-encoding helper is exact for an arbitrary pattern
    val s = Set(0, 9, 23, 31, 42, 59)
    val img = Multimodal.decodePixels(imgOfBits(s)).get
    val h = Multimodal.dHash60(img).get
    assert((0 until 60).filter(b => (h >> b & 1L) == 1L).toSet === s)
  }

  test("dHash60 is invariant under exact 2x and 3x upscales") {
    def base(x: Int, y: Int): Int = (x * 37 + y * 91 + 13) % 240
    val h1 = Multimodal.dHash60(
      Multimodal.decodePixels(grayPng(11, 6, base)).get)
    val h2 = Multimodal.dHash60(
      Multimodal.decodePixels(grayPng(22, 12, (x, y) => base(x / 2, y / 2))).get)
    val h3 = Multimodal.dHash60(
      Multimodal.decodePixels(grayPng(33, 18, (x, y) => base(x / 3, y / 3))).get)
    assert(h1.isDefined && h1 === h2 && h1 === h3)
  }

  test("dHash60: a one-cell brightness jitter flips at most 2 bits") {
    def base(x: Int, y: Int): Int = (x * 53 + y * 17 + 31) % 240
    val h = Multimodal.dHash60(
      Multimodal.decodePixels(grayPng(11, 6, base)).get).get
    val j = Multimodal.dHash60(Multimodal.decodePixels(grayPng(11, 6,
      (x, y) => base(x, y) + (if (x == 4 && y == 3) 8 else 0))).get).get
    assert(java.lang.Long.bitCount(h ^ j) <= 2)
  }

  test("dHash60 is None below thumbnail size; imageDHash NULLs bad rows") {
    import spark.implicits._
    assert(Multimodal.dHash60(
      Multimodal.decodePixels(grayPng(10, 6, (x, _) => x)).get).isEmpty)
    assert(Multimodal.dHash60(
      Multimodal.decodePixels(grayPng(11, 5, (x, _) => x)).get).isEmpty)
    val in = Seq(
      (1L, grayPng(11, 6, (x, _) => 30 - x)),
      (2L, "garbage".getBytes),
      (3L, grayPng(4, 3, (x, _) => x))).toDF("doc_id", "payload")
    val out = Multimodal.imageDHash(in, "doc_id").orderBy("id").collect()
    assert(out(0).getLong(3) === (1L << 60) - 1)
    assert(out(1).isNullAt(1) && out(1).isNullAt(3))
    assert(out(2).getInt(1) === 4 && out(2).isNullAt(3))
  }

  // ---- audioDHash60 / audio near-dup ----------------------------------

  /** 61 samples (one per envelope window) whose audioDHash60 has EXACTLY
    * the given bits: each set bit steps the |sample| down by 1. */
  private def audioOfBits(bits: Set[Int]): Array[Short] = {
    val s = new Array[Short](61)
    s(0) = 1000
    for (w <- 0 until 60)
      s(w + 1) = (s(w) - (if (bits(w)) 1 else 0)).toShort
    s
  }

  test("audioDHash60: hand-computed envelopes, abs energy, uneven windows") {
    import Multimodal.PcmAudio
    def pcm(s: Array[Short]) = PcmAudio(8000, 1, 16, s.map(_.toInt))
    // strictly rising |sample| -> no bit; strictly falling -> all 60
    assert(Multimodal.audioDHash60(
      pcm(Array.tabulate(61)(i => (100 + i).toShort))) === Some(0L))
    assert(Multimodal.audioDHash60(
      pcm(Array.tabulate(61)(i => (200 - i).toShort))) === Some((1L << 60) - 1))
    // energy is |sample|: a falling NEGATIVE ramp is a rising envelope
    assert(Multimodal.audioDHash60(
      pcm(Array.tabulate(61)(i => (-100 - i).toShort))) === Some(0L))
    // uneven windows (n = 100): windows are [w*100/61, (w+1)*100/61) —
    // recompute the same floor arithmetic independently and compare
    val arr = Array.tabulate(100)(i => ((i * 37 + 11) % 200 - 100).toShort)
    val e = Array.tabulate(61) { w =>
      (w * 100 / 61 until (w + 1) * 100 / 61)
        .map(i => math.abs(arr(i).toLong)).sum
    }
    val expect = (0 until 60).filter(w => e(w) > e(w + 1))
      .map(1L << _).foldLeft(0L)(_ | _)
    assert(Multimodal.audioDHash60(pcm(arr)) === Some(expect))
    // the bit-encoding helper is exact
    val s = Set(3, 14, 29, 44, 58)
    val h = Multimodal.audioDHash60(pcm(audioOfBits(s))).get
    assert((0 until 60).filter(b => (h >> b & 1L) == 1L).toSet === s)
  }

  test("audioDHash60 is invariant under exact sample duplication") {
    val base = Array.tabulate(183)(i => ((i * 53 + 7) % 300 - 150).toShort)
    val doubled = Array.tabulate(366)(i => base(i / 2))
    def pcm(s: Array[Short]) = Multimodal.PcmAudio(8000, 1, 16, s.map(_.toInt))
    val h1 = Multimodal.audioDHash60(pcm(base))
    val h2 = Multimodal.audioDHash60(pcm(doubled))
    assert(h1.isDefined && h1 === h2)
  }

  test("audioDHash60 is None below 61 samples; audioDHash NULLs bad rows") {
    import spark.implicits._
    assert(Multimodal.audioDHash60(
      Multimodal.PcmAudio(8000, 1, 16, Array.fill(60)(5))).isEmpty)
    val in = Seq(
      (1L, Multimodal.syntheticWavPcm(8000, 1,
        Array.tabulate(61)(i => (200 - i).toShort))),
      (2L, Array[Byte](9, 9, 9)),
      (3L, Multimodal.syntheticWavPcm(8000, 1, Array[Short](1, 2, 3))))
      .toDF("doc_id", "payload")
    val out = Multimodal.audioDHash(in, "doc_id").orderBy("id").collect()
    assert(out(0).getLong(2) === (1L << 60) - 1)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(2).getInt(1) === 3 && out(2).isNullAt(2))
  }

  test("audioNearDupPairs: same pigeonhole contract as the image path") {
    import spark.implicits._
    val sA = Set(7, 33)
    def wav(bits: Set[Int]) =
      Multimodal.syntheticWavPcm(8000, 1, audioOfBits(bits))
    val in = Seq(
      (1L, wav(sA)),
      (2L, wav(sA)),                          // identical -> hamming 0
      (3L, wav(sA ++ Set(50, 51, 52, 53))),   // 4 flips -> over the cap
      (4L, wav(sA ++ Set(15, 16, 17)))        // 3 flips all in band 1
    ).toDF("doc_id", "payload")
    val pairs = Multimodal.audioNearDupPairs(in, "doc_id", maxHamming = 3)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set((1L, 2L, 0), (1L, 4L, 3), (2L, 4L, 3)))
  }

  test("imageNearDupPairs: banding is lossless at the Hamming cap") {
    import spark.implicits._
    val sA = Set(5, 17)
    val in = Seq(
      (1L, imgOfBits(sA)),                          // base
      (2L, imgOfBits(sA)),                          // identical -> hamming 0
      (3L, imgOfBits(sA ++ Set(40, 41, 42, 43))),   // 4 flips -> over the cap
      // 3 flips ALL inside band 0 (bits 0-14) — the pigeonhole worst
      // case: bands 1-3 must still produce the candidate
      (4L, imgOfBits(sA ++ Set(0, 1, 2)))           // bits {0,1,2} added
    ).toDF("doc_id", "payload")
    val pairs = Multimodal.imageNearDupPairs(in, "doc_id", maxHamming = 3)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set((1L, 2L, 0), (1L, 4L, 3), (2L, 4L, 3)))
  }
}
