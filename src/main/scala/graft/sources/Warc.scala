package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** WARC (Web ARChive, ISO 28500) reading — the container format of
  * Common Crawl and every major web-scale text corpus, i.e. the raw
  * input of an LLM training-data pipeline. A WARC file is a sequence of
  * records (`WARC/1.0` + named headers + blank line + `Content-Length`
  * bytes of payload + blank line), optionally gzipped — per RECORD, as
  * concatenated gzip members, which is how Common Crawl ships (the JDK's
  * `GZIPInputStream` reads multi-member streams transparently).
  *
  * The parser here is REAL and total: header walk, exact
  * `Content-Length` payload slicing, record-boundary validation, and
  * HTTP-message body extraction for `response` records (the part a text
  * pipeline wants); malformed input yields the records parsed up to the
  * corruption and stops — reject-don't-crash, like every decoder in this
  * engine. [[build]] is the writer face, which also makes the read path
  * synthesize-and-mirror testable end to end.
  *
  * Scale shape: one WARC file (or Common Crawl segment) is one row and
  * parses where it sits — `mapPartitions`, payloads never shuffle; the
  * exploded (record metadata, body) stream is what enters the engine,
  * and everything downstream is ordinary columns. */
object Warc {

  /** One parsed record: the WARC-Type, the standard addressing headers,
    * and the raw payload block. */
  final case class WarcRecord(
      recordType: String,
      targetUri: Option[String],
      date: Option[String],
      contentType: Option[String],
      payload: Array[Byte])

  private val Crlf = "\r\n"

  /** Serialize records as a WARC/1.0 byte stream; `gzipPerRecord` emits
    * one gzip member per record — the Common Crawl layout. */
  def build(records: Seq[WarcRecord], gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val h = new StringBuilder()
        .append("WARC/1.0").append(Crlf)
        .append("WARC-Type: ").append(r.recordType).append(Crlf)
      r.targetUri.foreach(u => h.append("WARC-Target-URI: ").append(u).append(Crlf))
      r.date.foreach(d => h.append("WARC-Date: ").append(d).append(Crlf))
      r.contentType.foreach(c => h.append("Content-Type: ").append(c).append(Crlf))
      h.append("Content-Length: ").append(r.payload.length).append(Crlf)
      h.append(Crlf)
      val head = h.toString.getBytes("UTF-8")
      val tail = (Crlf + Crlf).getBytes("UTF-8")
      if (gzipPerRecord) {
        val member = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(member)
        gz.write(head); gz.write(r.payload); gz.write(tail); gz.finish()
        out.write(member.toByteArray)
      } else {
        out.write(head); out.write(r.payload); out.write(tail)
      }
    }
    out.toByteArray
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 65536)
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Parse every record of a (possibly multi-member-gzipped) WARC byte
    * stream. Total: malformed trailing content ends the parse with the
    * records seen so far; a stream that is not WARC at all parses to
    * Nil. */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] = {
    if (bytes == null || bytes.length < 4) return Nil
    val raw =
      if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        try gunzipAll(bytes) catch { case _: Exception => return Nil }
      else bytes
    val recs = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < raw.length && !(raw(i) == '\r' && raw(i + 1) == '\n')) i += 1
      if (i + 1 < raw.length) i else -1
    }
    while (pos < raw.length) {
      // skip inter-record padding (tolerate extra blank lines)
      while (pos + 1 < raw.length && raw(pos) == '\r' && raw(pos + 1) == '\n') pos += 2
      if (pos >= raw.length) return recs.toSeq
      val ve = lineEnd(pos)
      if (ve < 0) return recs.toSeq
      val version = new String(raw, pos, ve - pos, "UTF-8")
      if (!version.startsWith("WARC/")) return recs.toSeq
      pos = ve + 2
      var recordType = ""
      var uri: Option[String] = None
      var date: Option[String] = None
      var ctype: Option[String] = None
      var clen = -1L
      var headerDone = false
      while (!headerDone) {
        val he = lineEnd(pos)
        if (he < 0) return recs.toSeq
        if (he == pos) { headerDone = true; pos += 2 } // blank line
        else {
          val line = new String(raw, pos, he - pos, "UTF-8")
          pos = he + 2
          val colon = line.indexOf(':')
          if (colon > 0) {
            val k = line.substring(0, colon).trim.toLowerCase
            val v = line.substring(colon + 1).trim
            k match {
              case "warc-type" => recordType = v
              case "warc-target-uri" => uri = Some(v)
              case "warc-date" => date = Some(v)
              case "content-type" => ctype = Some(v)
              case "content-length" =>
                clen = try v.toLong catch { case _: NumberFormatException => -1L }
              case _ => ()
            }
          }
        }
      }
      if (clen < 0 || pos + clen > raw.length) return recs.toSeq
      val payload = java.util.Arrays.copyOfRange(raw, pos, (pos + clen).toInt)
      pos = (pos + clen).toInt
      recs += WarcRecord(recordType, uri, date, ctype, payload)
    }
    recs.toSeq
  }

  /** The body of an HTTP message payload (a `response` record carries
    * status line + headers + CRLF CRLF + body): the bytes after the
    * first blank line, None when no header terminator exists. */
  def httpBody(payload: Array[Byte]): Option[Array[Byte]] = {
    var i = 0
    while (i + 3 < payload.length &&
      !(payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')) i += 1
    if (i + 3 < payload.length)
      Some(java.util.Arrays.copyOfRange(payload, i + 4, payload.length))
    else None
  }

  /** Partition-wise WARC explode: one input row (id, payload) per WARC
    * file → one output row per record, with the addressing headers, the
    * payload length, and — for records whose payload is an HTTP message
    * — the extracted body as a string. The file parses where it sits;
    * only the record stream (exactly what downstream text operators
    * consume) leaves the scan. */
  def records(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        parseAll(payload).zipWithIndex.map { case (r, i) =>
          val body = r.contentType match {
            case Some(ct) if ct.startsWith("application/http") =>
              httpBody(r.payload).map(b => new String(b, "UTF-8"))
            case _ => None
          }
          (id, i, r.recordType, r.targetUri, r.date,
            r.payload.length.toLong, body)
        }
      })
      .toDF("id", "rec_idx", "record_type", "target_uri", "warc_date",
        "payload_len", "http_body")
  }
}
