package graft.functions

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the ftfy-class fix for UTF-8 text that was decoded
  * as Windows-1252 somewhere in a pipeline ("café" → "cafÃ©",
  * "don’t" → "donÃ¢â‚¬â„¢t" when it happened twice). The repair inverts
  * the misdecode: re-encode the string's chars as their cp1252 bytes and
  * strictly re-decode those bytes as UTF-8; if EITHER step fails — a
  * char cp1252 can't represent, or a byte sequence that isn't valid
  * UTF-8 — the input was not cp1252-misdecoded UTF-8 and is returned
  * unchanged, so genuinely-Latin-1 text ("café" itself: é → 0xE9 is not
  * a valid UTF-8 sequence) never corrupts. Repairs iterate to a
  * fixpoint (bounded) so double/triple-encoded text unwinds fully.
  *
  * Deterministic pure function of the input; the classic false-positive
  * (text that legitimately spells "Ã©" and round-trips) is the
  * documented trade every mojibake fixer makes. ASCII fast path: a
  * string with no char ≥ U+0080 is returned as-is without en/decoding.
  *
  * cp1252 and not ISO-8859-1 because real-world mojibake contains the
  * 0x80-0x9F graphics (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ' ' " " • – — ˜ ™ š ›
  * œ ž Ÿ): the "â€™" apostrophe needs € = 0x80 and ™ = 0x99. The five
  * bytes cp1252 leaves UNDEFINED (0x81 0x8D 0x8F 0x90 0x9D) are a hard
  * recoverability boundary, in this repairer and in the wild: a
  * misdecode that hit one of them replaced it with U+FFFD (or dropped
  * it) at corruption time — the information is gone, no re-encode can
  * recover it — so such text fails the cp1252 encode here and passes
  * through unchanged. U+201D " and the em dash are the common victims
  * (their UTF-8 tails land on 0x9D at the first and second misdecode
  * respectively). */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  def repairRow(v: UTF8String): UTF8String =
    UTF8String.fromString(FixMojibake.repair(v.toString))

  override protected def nullSafeEval(v: Any): Any =
    repairRow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fixMojibake", this, classOf[FixMojibake].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.repairRow($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object FixMojibake {
  private val Cp1252: Charset = Charset.forName("windows-1252")
  private val Utf8: Charset = Charset.forName("UTF-8")

  /** At most this many unwind passes — triple-encoding is the deepest
    * seen in the wild; the fixpoint usually lands in 1-2. */
  val MaxPasses = 4

  /** One unwind step: cp1252-encode, strict-UTF-8-decode. None when the
    * string is not a cp1252 image of valid UTF-8 bytes. */
  private def unwindOnce(s: String): Option[String] = {
    try {
      val enc = Cp1252.newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val bytes = enc.encode(java.nio.CharBuffer.wrap(s))
      val dec = Utf8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(bytes).toString)
    } catch { case _: CharacterCodingException => None }
  }

  def repair(s: String): String = {
    var cur = s
    var pass = 0
    // fast path: nothing to repair without a non-ASCII char, and an
    // unwound string that went pure-ASCII can't unwind further
    while (pass < MaxPasses && cur.exists(_ >= 0x80)) {
      unwindOnce(cur) match {
        case Some(next) if next != cur => cur = next; pass += 1
        case _ => return cur
      }
    }
    cur
  }
}
