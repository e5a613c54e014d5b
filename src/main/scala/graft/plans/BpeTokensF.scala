package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd BPE encode: subword tokens of a text under a
  * learned merge table, exactly `graft.llm.Bpe.encodeText` (delegated —
  * one source of truth with the driver-side trainer, so the q116
  * sample re-encode cannot drift). The merge table rides as a foldable
  * `array<array<string>>` literal (rank = index) — the
  * [[NearestCellsF]] codebook pattern: model-sized, embedded in the
  * plan, no UDF serialization, no broadcast handle.
  *
  * Unlike the codebook (read positionally per row), BPE needs the
  * merges as a rank HASH MAP; building it per row would dominate the
  * encode. A THREAD-LOCAL identity-keyed memo caches the converted
  * map: each Spark task deserializes its own copy of the literal's
  * ArrayData, so a shared single slot would be overwritten by
  * concurrent tasks and miss on nearly every row — per-thread slots
  * hit on every row after the task's first. Identity keying is only
  * sound for a CONSTANT merges argument (a non-literal column could
  * present the same buffer object with different contents, returning
  * stale ranks — ADVICE r15), so `checkInputDataTypes` rejects a
  * non-foldable merges child at analysis.
  *
  * Registered as SQL function `graft_bpe_tokens(text, merges)` by
  * [[GraftExtensions]].
  */
case class BpeTokensF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(ArrayType(StringType, _), _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_bpe_tokens requires a foldable (plan-constant) merges " +
            "argument: the rank memo is keyed on the deserialized " +
            "constant's object identity, which only a literal guarantees")
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_tokens expects (string, array<array<string>>), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any, m: Any): Any =
    BpeTokensF.compute(t.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.plans.BpeTokensF.compute($t, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeTokensF =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bpe_tokens"
}

object BpeTokensF {

  private val memo =
    new ThreadLocal[(AnyRef, Map[(String, String), Int])]

  private def ranksFor(m: ArrayData): Map[(String, String), Int] = {
    val cached = memo.get()
    if (cached != null && (cached._1 eq m)) cached._2
    else {
      val n = m.numElements()
      val b = Map.newBuilder[(String, String), Int]
      var i = 0
      while (i < n) {
        val p = m.getArray(i)
        if (p.numElements() >= 2)
          b += ((p.getUTF8String(0).toString, p.getUTF8String(1).toString) -> i)
        i += 1
      }
      val ranks = b.result()
      memo.set((m, ranks))
      ranks
    }
  }

  def compute(t: UTF8String, m: ArrayData): ArrayData = {
    val toks = graft.llm.Bpe.encodeText(t.toString, ranksFor(m))
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}
