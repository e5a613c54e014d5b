package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact per-group median as an Aggregator — the second concrete proof
  * (next to [[TopKAgg]]) that Spark's Aggregator surface covers the
  * reference's Algebraic/Accumulator UDF contracts
  * [R: src/org/apache/pig/Accumulator.java, Algebraic.java]:
  * `reduce` is the Accumulator's `accumulate` (values stream into the
  * buffer batch by batch, the bag never materializes as a column), and
  * `merge` is the Algebraic combiner step.
  *
  * Median is deliberately a HOLISTIC aggregate: the buffer is O(group)
  * because no smaller sufficient statistic exists — this is the honest
  * worst case of the Accumulator surface. The buffer is a mutable
  * ArrayBuffer mutated in place (udaf wraps the Aggregator in a
  * TypedImperativeAggregate, so the buffer lives as a JVM object
  * between updates and serializes only at shuffle/spill boundaries) —
  * per-row cost is an amortized array append, not an immutable-Seq
  * copy. Memory envelope: 8 bytes per group row; a 10M-row hot group
  * is ~80 MB of executor heap, so at 100 TB use this only on bounded
  * groups; for unbounded groups the scale path is `percentile_approx`
  * (fixed-size sketch, partial/final), which Spark ships natively.
  *
  * Interpolation matches DuckDB/Postgres `median(double)`: mean of the
  * two middle values for even counts — so the oracle can re-derive it.
  */
class MedianAgg extends Aggregator[java.lang.Double, ArrayBuffer[Double], java.lang.Double] {

  override def zero: ArrayBuffer[Double] = ArrayBuffer.empty
  // boxed input: a primitive Double decodes SQL NULL as 0.0 (udaf
  // feeds nulls through un-filtered), silently skewing the median —
  // DuckDB/Postgres median ignores nulls, so we must too. NaN is
  // skipped like NULL (the KllAgg/TopKAgg convention): one NaN in an
  // even-count group would otherwise poison the midpoint mean, and in
  // an odd-count group silently shift the rank (Arrays.sort puts NaN
  // last). DuckDB instead ORDERS NaN last — a divergence, chosen to
  // avoid the poison; no oracle data contains NaN.
  override def reduce(buf: ArrayBuffer[Double], x: java.lang.Double): ArrayBuffer[Double] = {
    if (x != null && !x.isNaN) buf += x.doubleValue
    buf
  }
  override def merge(a: ArrayBuffer[Double], b: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    a ++= b; a
  }

  override def finish(r: ArrayBuffer[Double]): java.lang.Double = {
    val s = r.toArray
    java.util.Arrays.sort(s)
    val n = s.length
    // empty after null-skipping → SQL NULL, the DuckDB/Postgres median
    // convention (r17 review: NaN here silently slips past isNull /
    // na.drop and poisons downstream averages)
    if (n == 0) null
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  override def bufferEncoder: Encoder[ArrayBuffer[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ArrayBuffer[Double]]()
  override def outputEncoder: Encoder[java.lang.Double] =
    org.apache.spark.sql.Encoders.DOUBLE
}

object MedianAgg {

  /** Column form: median(col("x")) — usable directly in groupBy().agg(). */
  lazy val median: Column => Column = {
    val f = udaf(new MedianAgg)
    c => f(c)
  }
}
