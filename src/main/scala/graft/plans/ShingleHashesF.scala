package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd hashed k-word shingle set: the sorted distinct
  * 64-bit hashes of a text's k-grams, exactly
  * `graft.llm.Dedup.shingleHashSet` (the compute below DELEGATES to
  * that kernel — one source of truth, so the q31/q33/q66 hashes cannot
  * drift). Previously the minhash-LSH / n-gram-Jaccard /
  * decontamination pipelines computed this through
  * `rdd.mapPartitions` + `createDataFrame` hops, which break the plan
  * into DataFrame→RDD→DataFrame segments: the seams block whole-stage
  * codegen fusion with the surrounding operators and hide the scan
  * from AQE's statistics. As an Expression the shingling fuses into
  * the same generated function as the projection around it, and the
  * optimizer sees one uninterrupted plan.
  *
  * §4.3 "custom Expression" tier, same pattern as
  * [[DotProductF]]/[[FingerprintF]]/[[SignLshF]]/[[NearestCellsF]].
  * Registered as SQL function `graft_shingle_hashes(text, k)` by
  * [[GraftExtensions]].
  */
case class ShingleHashesF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hashes expects (string, int), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any, k: Any): Any =
    ShingleHashesF.compute(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.plans.ShingleHashesF.compute($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashesF =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_shingle_hashes"
}

object ShingleHashesF {
  /** Generated code calls this; it is a thin adapter around the JVM
    * kernel (UTF8String → String costs one copy — the same copy the
    * old RDD path paid in `r.getString`). */
  def compute(t: UTF8String, k: Int): ArrayData =
    new GenericArrayData(graft.llm.Dedup.shingleHashSet(t.toString, k))
}

/** Native codegen'd POSITIONAL k-word gram hashes: one 64-bit hash per
  * window in document order, exactly `graft.llm.Dedup.gramHashes`
  * (delegated — one source of truth). The positional sibling of
  * [[ShingleHashesF]] (which returns the sorted distinct SET):
  * span-level dedup needs to know where each gram occurs, so
  * positions and duplicates are preserved. Registered as SQL function
  * `graft_gram_hashes(text, k)` by [[GraftExtensions]].
  */
case class GramHashesF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_gram_hashes expects (string, int), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any, k: Any): Any =
    GramHashesF.compute(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.plans.GramHashesF.compute($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramHashesF =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_gram_hashes"
}

object GramHashesF {
  def compute(t: UTF8String, k: Int): ArrayData =
    new GenericArrayData(graft.llm.Dedup.gramHashes(t.toString, k))
}

/** Native codegen'd minhash band keys over a pre-hashed shingle set:
  * `bands` 64-bit keys, each mixing the band's r = numHashes/bands
  * minhash minima — exactly `graft.llm.Dedup.bandKeysFromHashes`
  * (delegated, like [[ShingleHashesF]]). Kills the second RDD hop in
  * `minhashLsh`: banding now runs in the same codegen stage as the
  * posexplode that follows it.
  *
  * Registered as SQL function
  * `graft_band_keys(hashes, numHashes, bands)` by [[GraftExtensions]].
  */
case class BandKeysF(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_band_keys expects (array<long>, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(hs: Any, nh: Any, b: Any): Any =
    BandKeysF.compute(hs.asInstanceOf[ArrayData],
      nh.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (hs, nh, b) => s"graft.plans.BandKeysF.compute($hs, $nh, $b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BandKeysF =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_band_keys"
}

object BandKeysF {
  def compute(hs: ArrayData, numHashes: Int, bands: Int): ArrayData =
    new GenericArrayData(
      graft.llm.Dedup.bandKeysFromHashes(hs.toLongArray(), numHashes, bands))
}

/** Native codegen'd minhash SIGNATURE over a pre-hashed shingle set:
  * `numHashes` 64-bit minima of the affine re-hash family — exactly
  * `graft.llm.Dedup.minhashFromHashes` (delegated). This is the
  * persistable half of the LSH sketch: `lshIncremental` stores one
  * signature per admitted document and re-derives band keys from it
  * with [[BandKeysSigF]], so `graft_band_keys(hs, n, b)` ==
  * `graft_band_keys_sig(graft_minhash_sig(hs, n), b)` by construction.
  *
  * Registered as SQL function `graft_minhash_sig(hashes, numHashes)`
  * by [[GraftExtensions]].
  */
case class MinhashSigF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig expects (array<long>, int), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(hs: Any, nh: Any): Any =
    MinhashSigF.compute(hs.asInstanceOf[ArrayData], nh.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (hs, nh) => s"graft.plans.MinhashSigF.compute($hs, $nh)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSigF =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_minhash_sig"
}

object MinhashSigF {
  def compute(hs: ArrayData, numHashes: Int): ArrayData =
    new GenericArrayData(
      graft.llm.Dedup.minhashFromHashes(hs.toLongArray(), numHashes))
}

/** Band keys from a STORED minhash signature (see [[MinhashSigF]]) —
  * `graft.llm.Dedup.bandKeysFromSig`, delegated.
  *
  * Registered as SQL function `graft_band_keys_sig(sig, bands)` by
  * [[GraftExtensions]].
  */
case class BandKeysSigF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_band_keys_sig expects (array<long>, int), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(sig: Any, b: Any): Any =
    BandKeysSigF.compute(sig.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sig, b) => s"graft.plans.BandKeysSigF.compute($sig, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BandKeysSigF =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_band_keys_sig"
}

object BandKeysSigF {
  def compute(sig: ArrayData, bands: Int): ArrayData =
    new GenericArrayData(
      graft.llm.Dedup.bandKeysFromSig(sig.toLongArray(), bands))
}
