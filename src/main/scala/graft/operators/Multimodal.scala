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
  * at scan speed. Only the pixel decode is stubbed (no image/audio codecs
  * in this environment): [[fakeDecodeFeatures]] derives a deterministic
  * feature vector from the raw bytes so the Spark-side plumbing — schema,
  * batch shape, partition-wise execution, downstream joins — is real and
  * tested, and a production decoder (JNI codec, ONNX runtime, ...) can be
  * swapped into [[decodePartition]] without touching the plan.
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
