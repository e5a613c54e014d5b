package graft.plans

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode text canonicalization — the pre-dedup /
  * pre-hash normalization step every public curation pipeline applies
  * before fingerprinting (CCNet, C4, Dolma lineage: dedup keys are
  * computed over NORMALIZED text so that case, accents, compatibility
  * forms and whitespace runs don't defeat exact dedup):
  *
  *   `trim(collapseWs(stripMarks(NFD(lower(NFKC(s))))))`
  *
  *   1. NFKC compatibility normalization (ligatures `ﬁ`→`fi`,
  *      fullwidth `Ａ`→`A`, compatibility digits/spaces);
  *   2. lowercase in `Locale.ROOT` (no Turkish-i surprises);
  *   3. NFD decomposition, dropping NON_SPACING_MARK code points
  *      (accent strip: `café`→`cafe`);
  *   4. every whitespace RUN collapses to one ASCII space, leading and
  *      trailing whitespace removed.
  *
  * The scan iterates CODE POINTS (surrogate-pair-safe — the repo
  * sharp-edge list: splitting by UTF-16 char mangles non-BMP text), so
  * `𝄞` and emoji survive unchanged. A final NFC pass recomposes the
  * mark-stripped NFD residue: without it the output is NOT idempotent
  * for scripts whose decompositions are not non-spacing marks (the r16
  * advice pass: Hangul syllables decompose to conjoining jamo — kept,
  * category Lo — and a second pass's NFKC recomposes them; spacing
  * combining marks, category Mc, likewise survive in decomposed form).
  * With it the output is composed, contains no non-spacing marks, no
  * upper case, no compatibility forms and no whitespace runs, so a
  * second pass is the identity (property-tested over Latin, Hangul and
  * Mc-mark scripts).
  *
  * §4.3 "custom Expression" tier, twin of [[FingerprintF]]: one JVM
  * call inside whole-stage codegen, not an interpreted lambda chain or
  * a regex cascade. Registered as SQL function `graft_normalize` by
  * [[GraftExtensions]]; surfaced as `Text.normalize` (q124).
  */
case class NormalizeTextF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    NormalizeTextF.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.NormalizeTextF.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextF =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize"
}

object NormalizeTextF {

  /** The kernel generated code calls into. */
  def compute(s: UTF8String): UTF8String = {
    val nfkc = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFKC)
    val nfd = java.text.Normalizer.normalize(
      nfkc.toLowerCase(Locale.ROOT), java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    var lastWs = true // true ⇒ a space would start a run (trims leading)
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      i += Character.charCount(cp)
      if (Character.getType(cp) == Character.NON_SPACING_MARK) ()
      else if (Character.isWhitespace(cp)) {
        if (!lastWs) { sb.append(' '); lastWs = true }
      } else {
        sb.appendCodePoint(cp)
        lastWs = false
      }
    }
    if (sb.length > 0 && sb.charAt(sb.length - 1) == ' ')
      sb.setLength(sb.length - 1)
    // recompose the mark-stripped NFD residue (Hangul jamo, spacing
    // combining marks) so the output is NFC and the function idempotent
    UTF8String.fromString(java.text.Normalizer.normalize(sb,
      java.text.Normalizer.Form.NFC))
  }
}
