package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FixMojibake, LuhnScrub}
import graft.operators.Multimodal
import graft.operators.Multimodal.{PcmAudio, PixelImage}
import graft.sources.Warc
import graft.sources.Warc.WarcRecord

/** Seeded randomized invariants for the pure-JVM kernels — hundreds of
  * generated cases per property, complementing the hand fixtures. All
  * deterministic (fixed seeds), no Spark session needed. */
class InvariantPropertySpec extends AnyFunSuite {

  test("WARC: build -> parseAll round-trips arbitrary record batches") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 60) {
      val recs = Seq.fill(1 + rnd.nextInt(5)) {
        // payload bytes include CRLFs and fake headers — Content-Length
        // alone must carry the boundary
        val payload = new Array[Byte](rnd.nextInt(200))
        rnd.nextBytes(payload)
        if (payload.length >= 9)
          Array[Byte]('\r', '\n', '\r', '\n', 'W', 'A', 'R', 'C', '/')
            .copyToArray(payload, rnd.nextInt(payload.length - 8))
        WarcRecord(
          Seq("response", "request", "resource")(rnd.nextInt(3)),
          if (rnd.nextBoolean()) Some(s"http://h${rnd.nextInt(99)}/p") else None,
          if (rnd.nextBoolean()) Some("2024-01-01T00:00:00Z") else None,
          Some("application/octet-stream"),
          payload)
      }
      val gz = rnd.nextBoolean()
      val parsed = Warc.parseAll(Warc.build(recs, gzipPerRecord = gz))
      assert(parsed.length === recs.length, s"gz=$gz")
      parsed.zip(recs).foreach { case (p, r) =>
        assert(p.recordType === r.recordType)
        assert(p.targetUri === r.targetUri)
        assert(p.payload.toSeq === r.payload.toSeq)
      }
    }
  }

  test("luhn_scrub: no Luhn-valid candidate survives, and scrub is idempotent") {
    val rnd = new scala.util.Random(42)
    def randomCard(valid: Boolean): String = {
      val n = 12 + rnd.nextInt(6) // 13-18 digits before the check digit
      val d = Array.fill(n)(rnd.nextInt(10))
      val sum = d.zipWithIndex.map { case (x, j) =>
        if (j % 2 == 0) { val y = 2 * x; if (y > 9) y - 9 else y } else x
      }.sum
      val c = (10 - sum % 10) % 10
      val digits = d.reverse.mkString + (if (valid) c else (c + 1 + rnd.nextInt(8)) % 10)
      // random grouping with the allowed single separators
      val sep = Seq("", " ", "-")(rnd.nextInt(3))
      if (sep.isEmpty) digits
      else digits.grouped(1 + rnd.nextInt(5)).mkString(sep)
    }
    val pattern = java.util.regex.Pattern.compile(
      "(?<![0-9-])\\d(?:[ -]?\\d){12,18}(?![0-9-])")
    for (i <- 1 to 300) {
      val valid = i % 2 == 0
      val s = s"ctx${rnd.nextInt(10)} ${randomCard(valid)} tail"
      val out = LuhnScrub.scrub(s)
      if (valid) assert(out.contains("<CC>"), s"valid card not masked in: $s")
      // THE invariant: whatever remains contains no Luhn-valid candidate
      val m = pattern.matcher(out)
      while (m.find()) {
        val digits = m.group().filter(_.isDigit)
        assert(!LuhnScrub.luhnValid(digits),
          s"surviving valid candidate '${m.group()}' in: $out (from: $s)")
      }
      assert(LuhnScrub.scrub(out) === out, s"not idempotent on: $s")
    }
  }

  test("fix_mojibake: repair(misdecode(s)) == s on chain-safe text, idempotent") {
    val rnd = new scala.util.Random(43)
    // chars whose UTF-8 bytes stay on defined cp1252 positions at both
    // misdecode depths (see FixMojibake's recoverability boundary)
    val safe = "abc XYZ 079 éàïöñüç’«»–€ ".toCharArray
    def moji(x: String): String = new String(x.getBytes("UTF-8"), "windows-1252")
    for (_ <- 1 to 300) {
      val s = Array.fill(1 + rnd.nextInt(40))(safe(rnd.nextInt(safe.length))).mkString
      val once = FixMojibake.repair(moji(s))
      assert(once === s, s"single unwind failed on: $s")
      val twice = FixMojibake.repair(moji(moji(s)))
      assert(twice === s, s"double unwind failed on: $s")
      assert(FixMojibake.repair(s) === FixMojibake.repair(FixMojibake.repair(s)))
    }
  }

  test("dHash60: brightness-shift and exact-upscale invariance on random rasters") {
    val rnd = new scala.util.Random(44)
    def gray(l: Int): Int = 0xff000000 | (l << 16) | (l << 8) | l
    for (_ <- 1 to 200) {
      val luma = Array.fill(6, 11)(rnd.nextInt(200)) // headroom for +55
      def img(f: (Int, Int) => Int, w: Int, h: Int) =
        PixelImage(w, h, Array.tabulate(w * h)(i => gray(f(i % w, i / w))))
      val base = Multimodal.dHash60(img((x, y) => luma(y)(x), 11, 6))
      val shift = 1 + rnd.nextInt(55)
      assert(Multimodal.dHash60(img((x, y) => luma(y)(x) + shift, 11, 6)) === base)
      assert(Multimodal.dHash60(
        img((x, y) => luma(y / 2)(x / 2), 22, 12)) === base)
    }
  }

  test("audioDHash60: negation and duplication invariance on random streams") {
    val rnd = new scala.util.Random(45)
    for (_ <- 1 to 200) {
      val n = 61 * (1 + rnd.nextInt(8))
      val s = Array.fill(n)(rnd.nextInt(60001) - 30000)
      val base = Multimodal.audioDHash60(PcmAudio(8000, 1, 16, s))
      // energy is |sample|: negating the waveform preserves the envelope
      assert(Multimodal.audioDHash60(PcmAudio(8000, 1, 16, s.map(-_))) === base)
      // sample-doubling preserves window ratios when 61 divides both
      val doubled = Array.tabulate(2 * n)(i => s(i / 2))
      assert(Multimodal.audioDHash60(PcmAudio(8000, 1, 16, doubled)) === base)
    }
  }
}
