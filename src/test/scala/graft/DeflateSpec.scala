package graft

import java.util.zip.Inflater

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{DeflateLen, TextFunctions}
import org.apache.spark.unsafe.types.UTF8String

/** [[DeflateLen]]: the falsifiable contract is the inflate round-trip (the
  * reported length must be the length of a stream that decodes back to the
  * input) plus the ordering property the quality signal relies on —
  * repetitive text compresses below natural prose, which compresses below
  * incompressible noise.
  */
class DeflateSpec extends SparkSpec {

  private def deflateBytes(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new Inflater(true)
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!inf.finished()) out.write(buf, 0, inf.inflate(buf))
    inf.end()
    out.toByteArray
  }

  test("deflatedLength equals the length of a stream that round-trips") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "unicode éèê 中文 mixed",
      "x")
    samples.foreach { s =>
      val viaExpr = DeflateLen.deflatedLength(UTF8String.fromString(s))
      val stream = deflateBytes(s)
      assert(viaExpr === stream.length, s)
      assert(new String(inflate(stream), "UTF-8") === s)
    }
  }

  test("ratio orders repetitive < prose < noise") {
    val rep = "spam spam spam " * 50
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "wanders far afield looking for letters to deliver ") * 10
    val rnd = new scala.util.Random(42)
    val noise = Array.fill(700)(rnd.nextPrintableChar()).mkString
    def ratio(s: String): Double =
      DeflateLen.deflatedLength(UTF8String.fromString(s)).toDouble / s.getBytes("UTF-8").length
    assert(ratio(rep) < ratio(prose))
    assert(ratio(prose) < ratio(noise))
    assert(ratio(noise) <= 1.1) // raw deflate adds only small framing overhead
  }

  private def columnOn(wholeStage: Boolean): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, wholeStage.toString)
    try {
      val texts = Seq("abc abc abc abc", "zq9!k", "", "日本語テキスト")
      val out = df("text STRING", texts.map(Row(_)))
        .select(col("text"),
          TextFunctions.deflateLen("text").as("dl"),
          TextFunctions.compressionRatio("text").as("cr"))
        .collect()
      out.foreach { r =>
        val s = r.getString(0)
        assert(r.getInt(1) === deflateBytes(s).length, s)
        if (s.isEmpty) assert(r.isNullAt(2))
        else {
          val expected = BigDecimal(deflateBytes(s).length.toDouble / s.getBytes("UTF-8").length)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(r.getDouble(2) === expected, s)
        }
      }
    } finally spark.conf.set(key, prev)
  }

  test("column wrappers (whole-stage codegen)") { columnOn(true) }
  test("column wrappers (interpreted)") { columnOn(false) }
}
