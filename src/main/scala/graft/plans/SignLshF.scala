package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native codegen'd sign-LSH bucket id over an `array<float>` column:
  * bit j = sign(v · h_(offset+j)) for `planes` deterministic
  * integer-hash hyperplanes (the formula `Similarity.planeComponent`
  * documents, so any SQL engine can reproduce the bucket). The
  * `offset` selects a disjoint hyperplane family per LSH table —
  * multi-table (OR-of-ANDs) banding uses table t = offset t·planes —
  * and offset 0 reproduces the single-table bucket bit-for-bit.
  * Bit-identical to the JVM kernel `Similarity.bucketK` and the HOF
  * Column form `Similarity.lshBucket` — same double accumulation
  * order — but compiled into whole-stage codegen instead of a Scala
  * UDF: planes × dim multiply-adds per row previously paid UDF
  * serialization on the embedding scan hot path (q39/q43/q79).
  *
  * Assumes non-null array ELEMENTS (the embedding tables' contract;
  * parquet schemas still say containsNull=true, so this is not
  * enforceable at type-check time without breaking those scans): a
  * null element reads as 0.0f here, where the HOF Column form would
  * null-poison the whole bucket — the bit-equality claim above holds
  * only on null-free arrays, which is what KernelPropsSpec generates.
  *
  * §4.3 "custom Expression" tier, third instance of the
  * [[DotProductF]]/[[FingerprintF]] pattern. Registered as SQL function
  * `graft_lsh_bucket(vec, planes[, offset])` by [[GraftExtensions]].
  */
case class SignLshF(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_bucket expects (array<float>, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any, p: Any, o: Any): Any =
    SignLshF.compute(v.asInstanceOf[ArrayData],
      p.asInstanceOf[Int], o.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p, o) => s"graft.plans.SignLshF.compute($v, $p, $o)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SignLshF =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_lsh_bucket"
}

object SignLshF {

  /** Component-index stride between consecutive hyperplanes. The old
    * stride of 64 made planes COLLIDE for vectors wider than 64 dims
    * (component(p, 64) == component(p+1, 0) — adjacent planes shared
    * most components, correlating bucket bits and quietly degrading
    * recall; r17 review). 4096 covers every common embedding width;
    * [[compute]] rejects wider vectors loudly. */
  val PlaneStride = 4096

  /** The kernel generated code calls into. Arithmetic is kept EXACTLY
    * as `Similarity.bucketK`: per bit j, d accumulates
    * v(i) * component(offset+j, i) left-to-right in double, where
    * component(p, i) = (((p*4096+i) * 2654435761) mod 1000003 mod 2001
    * - 1000) / 1000 — all operands non-negative, so `%` ≡ `pmod` and
    * the bucket is reproducible in any engine.
    */
  def compute(v: ArrayData, planes: Int, offset: Int): Long = {
    val n = v.numElements()
    if (n > PlaneStride) throw new IllegalArgumentException(
      s"graft_lsh_bucket: vector dim $n exceeds the plane stride $PlaneStride " +
        "— components would collide across planes")
    var acc = 0L
    var j = 0
    while (j < planes) {
      var d = 0.0
      var i = 0
      while (i < n) {
        val m = (((offset + j).toLong * PlaneStride + i) * 2654435761L) % 1000003L
        d += v.getFloat(i).toDouble * ((m % 2001L - 1000L).toDouble / 1000.0)
        i += 1
      }
      if (d > 0) acc |= 1L << j
      j += 1
    }
    acc
  }
}
