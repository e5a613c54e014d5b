package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join — the reference's BuildBloom/Bloom UDF pair
  * [R: src/org/apache/pig/builtin/BuildBloom.java, Bloom.java]: build a
  * bloom filter over the small side's keys, broadcast it, and pre-filter
  * the big side before the exact join.
  *
  * At 100 TB the point is shuffle-volume reduction: the bloom probe
  * drops non-matching rows map-side (no false negatives), so only
  * plausible matches reach the exchange; the exact semi-join then
  * removes the false positives. Locally the exact join alone would win —
  * the operator exists for the cluster shape.
  *
  * The probe is Spark's native `BloomFilterMightContain` expression
  * (registered as `graft_might_contain` by
  * [[graft.plans.GraftExtensions]]) over `xxhash64` of the key — the
  * same vectorized, codegen'd pair Spark's own runtime row-level
  * filtering uses. No Scala UDF: the filter stays inside whole-stage
  * codegen and works for any hashable key type.
  */
object BloomJoin {

  /** Left-semi join with a bloom pre-filter on the probe side.
    * Result is EXACTLY the semi-join (bloom only pre-filters).
    *
    * The bloom path requires IDENTICAL key types: xxhash64 is
    * type-sensitive, and hashing the build side through a cast to the
    * probe type can disagree with the exact join's own Catalyst
    * coercion (string "042" vs bigint 42: the join coerces and
    * matches, the cast-then-hash does not — a bloom FALSE NEGATIVE
    * that silently drops a matching row; under ANSI a malformed value
    * makes the cast itself throw where the plain join succeeds). With
    * differing types the pre-filter is skipped and the call IS the
    * exact semi-join — exactness is the contract, the bloom only an
    * optimization (r17 review).
    */
  def semiJoin(left: DataFrame, leftKey: String,
               right: DataFrame, rightKey: String,
               expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val exact = left.join(right, left(leftKey) === right(rightKey), "left_semi")
    if (left.schema(leftKey).dataType != right.schema(rightKey).dataType) exact
    else {
      val bf = right
        .select(xxhash64(col(rightKey)).as("__graft_h"))
        .stat.bloomFilter("__graft_h", expectedItems, fpp)
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      val probe =
        call_function("graft_might_contain", lit(bos.toByteArray), xxhash64(col(leftKey)))
      left.filter(probe)
        .join(right, left(leftKey) === right(rightKey), "left_semi")
    }
  }

  /** Anti-join complement: bloom can't pre-filter an anti-join (a bloom
    * "no" proves absence, but a "yes" might be false) — so only rows the
    * bloom REJECTS are definitely-kept, and the rest take the exact
    * path. Here we keep the exact anti-join and expose the same API for
    * symmetry.
    */
  def antiJoin(left: DataFrame, leftKey: String,
               right: DataFrame, rightKey: String): DataFrame =
    left.join(right, left(leftKey) === right(rightKey), "left_anti")
}
