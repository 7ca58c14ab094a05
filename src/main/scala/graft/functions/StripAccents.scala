package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native diacritic folding — the dedup-key normalizer next to
  * [[NfcNormalize]]: "café" / "cafe" and "Müller" / "Muller" are the
  * same page title, the same author name, and usually the same
  * document; folding accents before hashing/URL-keying/fuzzy blocking
  * collapses those classes at scan speed, where leaving them split
  * double-counts entities in every downstream dedup and vocab stage.
  *
  * Semantics: canonical decomposition (NFD), REMOVAL of marks — ALL
  * THREE mark categories (Mn non-spacing, Mc spacing-combining, Me
  * enclosing), matching utf8proc's STRIPMARK exactly: `é` → `e`,
  * `ñ` → `n`, Devanagari vowel signs (Mc) and enclosing marks (Me)
  * strip too (an Mn-only fold would silently disagree with DuckDB on
  * Indic text) — then canonical RE-COMPOSITION (NFC). The recompose is
  * NOT a no-op once marks are gone: Hangul syllables decompose to
  * conjoining Jamo (category Lo, not marks — nothing strips), and
  * without NFC `한국어` would come back as six Jamo code points while
  * utf8proc (probed directly: precomposed syllables round-trip
  * unchanged, raw Jamo input composes to syllables, `ガ` → `カ`)
  * returns precomposed syllables. Characters with no decomposition
  * (`ł`, `ø`, Han, emoji) pass through unchanged. This is exactly
  * DuckDB's `strip_accents`, which the oracle battery compares
  * against — two independent implementations (JDK
  * `java.text.Normalizer` tables here, utf8proc there) agreeing
  * byte-for-byte is the same independent-engines gate [[JaroWinkler]]
  * uses.
  *
  * Fast path: pure-ASCII input (the overwhelming majority of crawl
  * text) is detected in UTF8String bytes without decoding and returned
  * by REFERENCE — no allocation, no normalization pass. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  def computeRow(s: UTF8String): UTF8String = {
    // ASCII can carry no combining marks and NFD never changes it
    if (isAscii(s)) return s
    val str = s.toString
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
        t != Character.COMBINING_SPACING_MARK &&
        t != Character.ENCLOSING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    // NFC recompose — load-bearing for Hangul (Jamo → syllables); for
    // the dominant case (Latin/Greek/Cyrillic whose marks were just
    // removed) the stripped text is already NFC, so the quick-check
    // skips the second normalization pass + String copy and only the
    // genuinely composable leftovers pay for it
    val stripped = sb.toString
    val out =
      if (java.text.Normalizer.isNormalized(stripped, java.text.Normalizer.Form.NFC))
        stripped
      else java.text.Normalizer.normalize(stripped, java.text.Normalizer.Form.NFC)
    UTF8String.fromString(out)
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  override protected def nullSafeEval(v: Any): Any =
    computeRow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stripAccents", this, classOf[StripAccents].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.computeRow($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
