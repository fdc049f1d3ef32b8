package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition):
  * `unicode_nfc(text)` — the missing primitive under content-hash dedup.
  * The SAME text arrives from different producers in composed (é = U+00E9)
  * and decomposed (e + U+0301) forms; their bytes differ, so sha256/MinHash
  * dedup silently treats them as distinct documents unless hashing runs
  * over a canonical form first. Stays inside whole-stage codegen (one
  * static call per row); the common all-ASCII/already-normalized case is a
  * cheap `isNormalized` scan that returns the input UTF8String untouched —
  * no copy, no garbage.
  *
  * Oracle parity: DuckDB's `nfc_normalize` (utf8proc) implements the same
  * UAX #15 composition, so canonicalization pipelines replay exactly. */
case class UnicodeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_nfc"

  override def nullSafeEval(input: Any): Any =
    UnicodeNfc.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = UnicodeNfc.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.nfc($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNfc =
    copy(child = newChild)
}

object UnicodeNfc {
  /** Shared by interpreted eval and codegen. Identity (no allocation) when
    * already NFC — true for all-ASCII text, i.e. almost every row of a
    * real corpus. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Accent stripping: `strip_accents(text)` — NFD decomposition with every
  * COMBINING mark dropped (é → e, ü → u, ñ → n), the second primitive
  * under fuzzy-match canonical keys (station names, titles: "Hanwella"
  * must match "Hanwëlla" from a degraded feed). Deliberately NOT a
  * transliterator: ß/ø/æ/đ are distinct LETTERS with no canonical
  * decomposition and pass through unchanged — exactly the semantics of
  * DuckDB's `strip_accents` (utf8proc is NFD-based too; engine agreement
  * verified over the combining and non-decomposable classes), so folded
  * keys replay byte-for-byte. Identity fast path (no allocation) for text
  * containing no decomposable characters — all-ASCII rows scan once. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = StripAccents.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.strip($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  /** Shared by interpreted eval and codegen. NFD, then drop combining
    * marks; identity (no allocation) when already NFD-normalized with no
    * marks — the all-ASCII common case. */
  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd =
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFD)) str
      else java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < nfd.length && !hasMark) {
      val t = Character.getType(nfd.charAt(i))
      hasMark = t == Character.NON_SPACING_MARK ||
        t == Character.COMBINING_SPACING_MARK || t == Character.ENCLOSING_MARK
      i += 1
    }
    if (!hasMark) {
      if (nfd eq str) s else UTF8String.fromString(nfd)
    } else {
      val out = new java.lang.StringBuilder(nfd.length)
      var j = 0
      while (j < nfd.length) {
        val c = nfd.charAt(j)
        val t = Character.getType(c)
        if (t != Character.NON_SPACING_MARK &&
            t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK) out.append(c)
        j += 1
      }
      UTF8String.fromString(out.toString)
    }
  }
}
