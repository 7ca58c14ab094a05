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
  * and the lookarounds reject runs embedded in longer digit/dash
  * sequences (a 20+ digit run is NOT a card and no sub-window of it is
  * masked). Deterministic pure function; card-free rows return on a
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
    * REFERENCE unchanged (no allocation) when no candidate exists. */
  def scrub(s: String): String = {
    val m = CardPattern.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    var changed = false
    do {
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
      sb.append(s, last, m.start)
      if (luhnValid(digits)) { sb.append("<CC>"); changed = true }
      else sb.append(g)
      last = m.end
    } while (m.find())
    if (!changed) return s
    sb.append(s, last, s.length)
    sb.toString
  }
}
