package graft.ops

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
  */
object BloomJoin {

  /** Left-semi join with a bloom pre-filter on the probe side.
    * Result is EXACTLY the semi-join (bloom only pre-filters).
    */
  def semiJoin(left: DataFrame, leftKey: String,
               right: DataFrame, rightKey: String,
               expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val bf = right.stat.bloomFilter(rightKey, expectedItems, fpp)
    val bc = left.sparkSession.sparkContext.broadcast(bf)
    val probe = udf((k: Long) => k != null && bc.value.mightContainLong(k))
    left.filter(probe(col(leftKey).cast("long")))
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
