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
    */
  def semiJoin(left: DataFrame, leftKey: String,
               right: DataFrame, rightKey: String,
               expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    // Hash both sides identically: xxhash64 is type-sensitive (int and
    // long hash differently), so the build side casts to the probe
    // side's key type before hashing.
    val probeType = left.schema(leftKey).dataType
    val bf = right
      .select(xxhash64(col(rightKey).cast(probeType)).as("__graft_h"))
      .stat.bloomFilter("__graft_h", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe =
      call_function("graft_might_contain", lit(bos.toByteArray), xxhash64(col(leftKey)))
    left.filter(probe)
      .join(right, left(leftKey) === right(rightKey), "left_semi")
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
