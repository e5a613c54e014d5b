package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed range (proximity) join — pair each left row with the
  * right rows whose time lies within ±radius of the left row's time,
  * with NO equality key required. The reference (and naive Spark)
  * compiles a pure inequality join to a nested-loop over the full
  * cross product (`BroadcastNestedLoopJoin` / CROSS + FILTER in Pig),
  * which is quadratic and does not survive scale.
  *
  * Scale shape — bucketize the time axis so the inequality becomes an
  * equi-join Catalyst can hash-partition:
  *
  *   1. left rows map to ONE bucket: `floor(t / width)`;
  *   2. right rows explode to the buckets their ±radius window
  *      overlaps — with `width = radius` that is ≤ 3 buckets, so the
  *      blowup is a small constant;
  *   3. hash equi-join on the bucket id, then filter the exact
  *      `|tl − tr| ≤ radius` predicate.
  *
  * Every qualifying pair meets in exactly one bucket — the left row's
  * — so no dedup pass is needed. Cost: one hash shuffle over
  * |L| + 3|R| rows instead of |L|×|R| comparisons. Bucket population
  * is rate×width rows; a hot time region is ordinary shuffle skew
  * (AQE splits it), not a plan-shape failure.
  */
object RangeJoin {

  /** For each left row, count right rows within ±radius (microseconds)
    * of its timestamp. LEFT semantics: left rows with no right row in
    * range keep count 0 — via LEFT OUTER on the bucket + conditional
    * count, so no third re-join shuffle is needed (the unique left id
    * makes the groupBy map-side-combine to one row per left row).
    * Timestamps compare at microsecond resolution (`unix_micros`).
    *
    * @param leftId   unique left key (all other left columns ride
    *                 through as `first(...)` within the group)
    * @param radiusUs proximity radius in microseconds
    * @param widthUs  bucket width; defaults to the radius (≤3 buckets
    *                 per right row). Tune for axis density.
    */
  def countWithinRadius(left: DataFrame, right: DataFrame,
                        leftId: String, leftTime: String, rightTime: String,
                        radiusUs: Long, widthUs: Long = 0L,
                        as: String = "n_in_range"): DataFrame = {
    val width = if (widthUs > 0) widthUs else radiusUs
    require(width > 0, "bucket width must be positive")

    val lt = unix_micros(col(leftTime))
    val rt = unix_micros(col(rightTime))

    // decimal division, not `/` (which promotes long to DOUBLE): at
    // ≥ 2^53 µs a double's ulp exceeds 32 µs, so the two sides could
    // round a boundary timestamp into different buckets and silently
    // drop an in-range pair — the AsofJoin.bucketOf rule (r17 review)
    def bucket(t: Column): Column =
      floor(t.cast("decimal(38,0)") / lit(width)).cast("long")

    val l = left.withColumn("graft_rj_t", lt)
      .withColumn("graft_rj_b", bucket(lt))
    val r = right.select(rt.as("graft_rj_rt"),
      explode(sequence(bucket(rt - radiusUs),
        bucket(rt + radiusUs))).as("graft_rj_b"))

    val carried: Seq[Column] =
      left.columns.toSeq.filterNot(_ == leftId).map(c => first(col(c)).as(c))
    val cnt = count(when(
      abs(col("graft_rj_t") - col("graft_rj_rt")) <= radiusUs, 1)).as(as)
    val aggs = carried :+ cnt

    l.join(r, Seq("graft_rj_b"), "left")
      .groupBy(col(leftId))
      .agg(aggs.head, aggs.tail: _*)
  }
}
