package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen'd IVF cell assignment: the indices of the `n` nearest
  * codebook centroids (L2, ties broken by lowest index) for an
  * `array<float>` vector. The codebook rides along as a foldable
  * `array<array<double>>` literal — a coarse quantizer is k × dim
  * doubles (16 × 32 here), small enough to embed in the plan, so every
  * generated-code row evaluation reads it straight from the already
  * deserialized `ArrayData` with zero per-row setup.
  *
  * Bit-identical to the JVM kernel `Similarity.nearestCells` — same
  * (vec(i) - cent(i))² double accumulation order, same (distance,
  * index) tie order (KernelPropsSpec) — but compiled into whole-stage
  * codegen instead of a Scala UDF: previously every corpus row paid UDF
  * serialization for nCells × dim multiply-adds on the q42 assign/probe
  * hot path, the last per-row UDF in the engine.
  *
  * Assumes non-null array ELEMENTS, like [[SignLshF]]: a null element
  * reads as 0.0 (vector) / 0.0d (codebook) instead of null-poisoning —
  * the bit-equality claim holds on null-free arrays, which is the
  * embedding tables' contract and what KernelPropsSpec generates.
  *
  * §4.3 "custom Expression" tier, fourth instance of the
  * [[DotProductF]]/[[FingerprintF]]/[[SignLshF]] pattern. Registered as
  * SQL function `graft_nearest_cells(vec, codebook, n)` by
  * [[GraftExtensions]].
  */
case class NearestCellsF(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_cells expects (array<float>, array<array<double>>, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any, cb: Any, n: Any): Any =
    NearestCellsF.compute(v.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, cb, n) => s"graft.plans.NearestCellsF.compute($v, $cb, $n)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCellsF =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_nearest_cells"
}

object NearestCellsF {
  /** The kernel generated code calls into. Arithmetic is kept EXACTLY
    * as `Similarity.nearestCells`: per centroid c, d accumulates
    * (vec(i) - cent(i))² left-to-right in double over the centroid's
    * dimensions; selection is by (d, c) ascending — strict `<` in the
    * scan keeps the lowest index on distance ties, matching the
    * kernel's stable sortBy. Assumes vec.length == centroid dims (the
    * quantizer's contract; mismatched dims read min of the two).
    */
  def compute(v: ArrayData, cb: ArrayData, n: Int): ArrayData = {
    val nc = cb.numElements()
    val vn = v.numElements()
    val dists = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val ct = cb.getArray(c)
      val len = math.min(ct.numElements(), vn)
      var d = 0.0
      var i = 0
      while (i < len) {
        val diff = v.getFloat(i).toDouble - ct.getDouble(i)
        d += diff * diff
        i += 1
      }
      dists(c) = d
      c += 1
    }
    val m = math.min(math.max(n, 0), nc)
    val out = new Array[Int](m)
    val used = new Array[Boolean](nc)
    var s = 0
    while (s < m) {
      var best = -1
      var bestD = 0.0
      var c2 = 0
      while (c2 < nc) {
        // total order with NaN greatest (java.lang.Double.compare) —
        // exactly the kernel's sortBy under Scala 2.13's
        // Ordering.Double.TotalOrdering, so a NaN distance (bad
        // embedding) ranks last instead of leaving best = -1 and
        // crashing the generated stage; strict < keeps the lowest index
        // on ties, matching the kernel's stable sortBy
        if (!used(c2) && (best < 0 || java.lang.Double.compare(dists(c2), bestD) < 0)) {
          bestD = dists(c2); best = c2
        }
        c2 += 1
      }
      used(best) = true
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}
