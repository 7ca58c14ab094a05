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

  /** Incrementally parse records off a (possibly multi-member-gzipped)
    * WARC stream. STREAMING on purpose: a standard Common Crawl segment
    * is ~1 GB gzipped / 4-5 GB inflated, which must never materialize as
    * one array — memory here is bounded by the largest single record.
    * Total: a malformed record ends the iterator with the records seen
    * so far; a stream that is not WARC at all yields nothing. The caller
    * owns closing the underlying stream. */
  def parseStream(in0: java.io.InputStream): Iterator[WarcRecord] = {
    val pb = new java.io.PushbackInputStream(in0, 2)
    val head = new Array[Byte](2)
    val n0 = pb.read(head)
    if (n0 > 0) pb.unread(head, 0, n0)
    val in: java.io.InputStream =
      if (n0 == 2 && (head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b)
        try new GZIPInputStream(pb, 65536)
        catch { case _: Exception => return Iterator.empty }
      else new java.io.BufferedInputStream(pb, 65536)

    // CRLF-terminated line, None at EOF/corruption; bounded so a
    // headerless binary blob can't buffer unboundedly
    def readLine(): Option[String] = {
      val buf = new ByteArrayOutputStream(64)
      var prev = -1
      var c = try in.read() catch { case _: Exception => -1 }
      while (c >= 0) {
        if (prev == '\r' && c == '\n') {
          val b = buf.toByteArray
          return Some(new String(b, 0, b.length - 1, "UTF-8"))
        }
        buf.write(c)
        if (buf.size > 65536) return None
        prev = c
        c = try in.read() catch { case _: Exception => -1 }
      }
      None
    }
    def readFully(n: Long): Option[Array[Byte]] = {
      if (n > Int.MaxValue - 8) return None
      val out = new Array[Byte](n.toInt)
      var off = 0
      while (off < n) {
        val r = try in.read(out, off, n.toInt - off)
          catch { case _: Exception => -1 }
        if (r < 0) return None
        off += r
      }
      Some(out)
    }

    new Iterator[WarcRecord] {
      private var nextRec: Option[WarcRecord] = advance()
      private def advance(): Option[WarcRecord] = {
        // skip inter-record blank lines until the version line
        var line = readLine()
        while (line.exists(_.isEmpty)) line = readLine()
        val version = line.getOrElse(return None)
        if (!version.startsWith("WARC/")) return None
        var recordType = ""
        var uri: Option[String] = None
        var date: Option[String] = None
        var ctype: Option[String] = None
        var clen = -1L
        var h = readLine().getOrElse(return None)
        while (h.nonEmpty) {
          val colon = h.indexOf(':')
          if (colon > 0) {
            val k = h.substring(0, colon).trim.toLowerCase
            val v = h.substring(colon + 1).trim
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
          h = readLine().getOrElse(return None)
        }
        if (clen < 0) return None
        readFully(clen).map(WarcRecord(recordType, uri, date, ctype, _))
      }
      override def hasNext: Boolean = nextRec.isDefined
      override def next(): WarcRecord = {
        val r = nextRec.get
        nextRec = advance()
        r
      }
    }
  }

  /** Parse every record of an in-memory WARC byte blob — the small-file
    * convenience face over [[parseStream]]. */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] = {
    if (bytes == null || bytes.length < 4) return Nil
    parseStream(new ByteArrayInputStream(bytes)).toSeq
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
        if (payload == null) Iterator.empty
        else parseStream(new ByteArrayInputStream(payload))
          .zipWithIndex.map { case (r, i) => recordRow(id, i, r) }
      })
      .toDF("id", "rec_idx", "record_type", "target_uri", "warc_date",
        "payload_len", "http_body")
  }

  private def recordRow(id: Long, i: Int, r: WarcRecord)
      : (Long, Int, String, Option[String], Option[String], Long, Option[String]) = {
    val body = r.contentType match {
      case Some(ct) if ct.startsWith("application/http") =>
        httpBody(r.payload).map(b => new String(b, "UTF-8"))
      case _ => None
    }
    (id, i, r.recordType, r.targetUri, r.date, r.payload.length.toLong, body)
  }

  /** The production Common Crawl path: read WARC files/segments straight
    * off a filesystem glob as STREAMS (`binaryFiles` hands each task a
    * seekable stream, never the whole file), parse incrementally, and
    * emit the same per-record schema as [[records]] keyed by file path.
    * One file = one task = one pass; memory is bounded by the largest
    * record, so multi-GB gzipped segments read fine. Partition
    * parallelism = file count — shard segments across the glob exactly
    * as Common Crawl publishes them (~1 GB apiece). */
  def readFiles(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val in = pds.open()
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
        // close-on-exhaustion alone leaks the handle when downstream
        // stops early (limit/take), throws mid-partition, or the task
        // aborts — the task-completion listener closes it on task end
        // regardless of how much of the iterator was consumed, while
        // the eager close below still frees handles early within a
        // long multi-file task
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeOnce())
        val it = parseStream(in).zipWithIndex
          .map { case (r, i) =>
            val row = recordRow(0L, i, r)
            (file, row._2, row._3, row._4, row._5, row._6, row._7)
          }
        new Iterator[(String, Int, String, Option[String], Option[String], Long, Option[String])] {
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) closeOnce()
            h
          }
          override def next() = it.next()
        }
      }
      .toDF("file", "rec_idx", "record_type", "target_uri", "warc_date",
        "payload_len", "http_body")
  }
}
