package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (HyperLogLog, Datasketches HLL_8)
  * — the 100 TB replacement for COUNT(DISTINCT x) when the distinct
  * set itself is too large to shuffle.
  *
  * The reference's surface stops at exact DISTINCT
  * [R: src/org/apache/pig/builtin/Distinct.java]; at corpus scale the
  * standing pattern (vocabulary size per source, unique users per day)
  * needs a sketch that (a) partial-aggregates map-side and (b) can be
  * PERSISTED and re-merged later without touching the raw data — e.g.
  * daily sketches unioned into monthly counts. Spark ships both halves
  * natively (`hll_sketch_agg` / `hll_union_agg`, codegen-adjacent
  * imperative aggregates with partial merge); these wrappers fix the
  * precision parameter and name the composition.
  *
  * Error envelope: lgConfigK = 12 → 2^12 registers → ~1.6% relative
  * standard error; the spec and q91 assert the 5%-band that bound
  * implies at our scales. Estimates are DETERMINISTIC for a given
  * input set (hash-based, order-insensitive merge), so boolean
  * properties derived from them are stable oracle outputs.
  */
object Sketches {

  val LgK = 12

  /** Per-group distinct sketch as a binary column (persist-friendly). */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     as: String = "sketch"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(LgK)).as(as))

  /** Merge previously materialized sketches down to coarser groups
    * (e.g. per-day → per-month) without re-reading raw data. */
  def mergeSketches(df: DataFrame, groupCols: Seq[String],
                    sketchCol: String = "sketch"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol)).as(sketchCol))

  /** Distinct-count estimate from a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** One-shot approximate distinct per group (no materialized sketch). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     as: String = "approx_nd"): DataFrame =
    distinctSketch(df, groupCols, valueCol)
      .select(groupCols.map(col) :+ estimate(col("sketch")).as(as): _*)
}
