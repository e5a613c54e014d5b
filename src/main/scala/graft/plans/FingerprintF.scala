package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial rolling hash of a string column —
  * h = fold over code points: h*31 + codepoint (mod 2^31-1) —
  * bit-identical to the SQL-expressible fold
  * `aggregate(split(text, ''), 0, (h, c) -> (h*31 + ascii(c)) % M)`
  * (split-by-empty yields one element per code point; `ascii` returns
  * the element's code point), but compiled into whole-stage codegen
  * instead of evaluating an interpreted lambda per CHARACTER — the
  * CodegenFallback pattern measured ~10-50x slower on scan hot paths
  * (see graft.llm.Dedup scaladoc). Two equivalence checks: a ScalaCheck
  * property in KernelPropsSpec pins the kernel to the code-point fold
  * spec over arbitrary strings including supplementary-plane
  * characters, and a TextSpec example test pins it to the interpreted
  * Column form (which survives as `Text.fingerprintColumnForm` for
  * SQL-oracle composition).
  *
  * §4.3 "custom Expression" tier, twin of [[DotProductF]]. Registered
  * as SQL function `graft_fingerprint` by [[GraftExtensions]]; used by
  * `Text.fingerprint` / `Text.shingleFingerprint` (q38, q40, q67).
  */
case class FingerprintF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    FingerprintF.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.FingerprintF.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintF =
    copy(child = newChild)

  override def prettyName: String = "graft_fingerprint"
}

object FingerprintF {
  private val Mod = 2147483647L // 2^31 - 1

  /** The kernel generated code calls into: iterates CODE POINTS (the
    * unit `split(text, '')` + `ascii` see), not UTF-16 chars, so
    * supplementary-plane characters hash as one step. All operands stay
    * non-negative (h < 2^31, cp < 2^21 ⇒ h*31+cp < 2^36), so `%` is
    * exactly `pmod`.
    */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}
