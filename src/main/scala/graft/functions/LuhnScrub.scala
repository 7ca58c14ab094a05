package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Checksum-validated credit-card scrubbing — the PII class a plain
  * regex can't do safely: any 13-19 digit run looks like a card number,
  * so regex-only scrubbers either mass-redact phone numbers, order ids,
  * and timestamps, or leak real PANs. This expression finds candidate
  * runs (digits in groups separated by single spaces or dashes, 13-19
  * digits total, not embedded in a longer digit run) and masks a run as
  * `<CC>` only when its digits pass the Luhn mod-10 check — the
  * checksum every real payment-card number carries. Invalid runs are
  * left byte-identical, so the false-positive rate drops 10x (a random
  * digit run passes Luhn 1 time in 10) with zero false negatives on
  * well-formed PANs.
  *
  * Candidate grammar: `(?<![0-9-])\d(?:[ -]?\d){12,18}(?![0-9-])` —
  * starts and ends on a digit, at most one separator between digits,
  * and the lookarounds reject candidates embedded in longer CONTIGUOUS
  * digit/dash sequences (a 20-digit contiguous run is not a card and no
  * sub-window of it is masked). SPACE-grouped runs longer than 19
  * digits are deliberately not protected the same way: a Luhn-valid
  * 13-19 digit prefix of "4111 1111 1111 1111 0000" still masks,
  * because for a PII scrubber the asymmetric risk says over-redact —
  * rejecting any digit-space-adjacent candidate to avoid that would
  * also skip a real PAN in "qty 2 4111111111111111", which is a leak.
  * Deterministic pure function; card-free rows return on a
  * no-allocation fast path, so the scrub runs at scan speed inside
  * whole-stage codegen. */
case class LuhnScrub(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "luhn_scrub"

  def scrubRow(v: UTF8String): UTF8String = {
    val s = v.toString
    val out = LuhnScrub.scrub(s)
    if (out eq s) v else UTF8String.fromString(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    scrubRow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("luhnScrub", this, classOf[LuhnScrub].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.scrubRow($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): LuhnScrub =
    copy(child = newChild)
}

object LuhnScrub {
  private val CardPattern =
    java.util.regex.Pattern.compile("(?<![0-9-])\\d(?:[ -]?\\d){12,18}(?![0-9-])")

  /** Standard Luhn mod-10: from the rightmost digit, double every second
    * digit (subtracting 9 on overflow); valid iff the sum ≡ 0 (mod 10). */
  def luhnValid(digits: String): Boolean = {
    var sum = 0
    var second = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (second) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      second = !second
      i -= 1
    }
    sum % 10 == 0
  }

  /** Mask every Luhn-valid candidate run as `<CC>`; returns the input
    * REFERENCE unchanged (no allocation) when no candidate exists.
    *
    * After a candidate FAILS Luhn, the scan resumes one character into
    * it rather than past it — a failed candidate must not shadow a card
    * it contains: "qty 2 4111111111111111" first matches the glued
    * "2 4111..." 17-digit window (invalid), and only the resume finds
    * the real PAN inside. Leak-averse like everything else here; the
    * cost is bounded (each failed candidate advances at least one char,
    * and a candidate is at most 37 chars). */
  def scrub(s: String): String = {
    val m = CardPattern.matcher(s)
    // the resume scan uses m.find(from), which RESETS the matcher and
    // restores its region to the whole input — so the lookarounds
    // always see the characters before `from`: a candidate attempt
    // after a resume still sees the digit before it (contiguous-run
    // sub-windows keep failing the lookbehind) while a space-preceded
    // card inside a failed glued candidate is found. A refactor to
    // region(from, len)-based scanning would need
    // useTransparentBounds(true) to keep this property; with find(int)
    // it holds by itself.
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    var changed = false
    var from = 0
    var found = true
    while (found) {
      val g = m.group()
      var digits = g
      if (g.indexOf(' ') >= 0 || g.indexOf('-') >= 0) {
        val b = new java.lang.StringBuilder(g.length)
        var i = 0
        while (i < g.length) {
          val c = g.charAt(i); if (c >= '0' && c <= '9') b.append(c); i += 1
        }
        digits = b.toString
      }
      if (luhnValid(digits)) {
        sb.append(s, last, m.start).append("<CC>")
        changed = true
        last = m.end
        from = m.end
      } else {
        from = m.start + 1
      }
      found = from < s.length && m.find(from)
    }
    if (!changed) return s
    sb.append(s, last, s.length)
    sb.toString
  }
}
