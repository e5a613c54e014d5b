package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) as a
  * mergeable Aggregator — point-frequency estimates for ANY key from a
  * fixed `depth × width` counter grid, where [[HeavyHittersAgg]] only
  * answers for the keys it kept. Together they are the classic pairing:
  * MG names the heavy keys, CMS estimates arbitrary ones; both ship
  * bounded state from every map task regardless of key cardinality.
  *
  * The reference's surface stops at exact COUNT
  * [R: src/org/apache/pig/builtin/COUNT.java]; at 100 TB the exact
  * per-key count shuffles every distinct key, while this sketch is
  * `depth·width` longs (64 KB at the 4×2048 default) partial-merged
  * map-side, PERSISTED as a plain `array<bigint>` column, and
  * re-merged later (daily → monthly) without touching raw data —
  * the [[Sketches]] HLL lifecycle, for frequencies.
  *
  * Hashing lives entirely in codegen'd Catalyst column math
  * ([[CountMin.buckets]]: `pmod(xxhash64(key, d), width)` per row d),
  * NOT inside the Aggregator — the aggregate input is the
  * already-computed index vector, so build and
  * [[CountMin.estimate]]-side lookups agree by construction (no JVM
  * re-implementation of the hash to drift). Null keys hash to null and
  * are skipped, like count/[[HeavyHittersAgg]].
  *
  * Guarantees (deterministic for a given dataset — fixed hashes, fixed
  * data; property-tested in CountMinSpec and the q117 oracle):
  * `true ≤ est` always (counters only over-count), and
  * `est ≤ true + e·N/width` per key with probability `1 − e^−depth`
  * over the hash draw — the q117 oracle asserts the slightly looser
  * integer bound `3·N/width`, which the fixed xxhash64 family
  * satisfies deterministically on the test corpora.
  *
  * Buffer discipline (the MedianAgg/HeavyHitters lesson): one flat
  * primitive `Array[Long]` mutated in place; udaf wraps the Aggregator
  * in a TypedImperativeAggregate, so the array lives as a JVM object
  * between rows and serializes only at shuffle/spill boundaries.
  */
class CountMinAgg(depth: Int, width: Int)
  extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(depth > 0 && width > 0, "count-min depth and width must be positive")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], idx: Seq[Long]): Array[Long] = {
    // null index vectors (null keys) are skipped, like count
    if (idx != null) {
      var d = 0
      while (d < depth) {
        buf(d * width + idx(d).toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(buf)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Elementwise vector-sum of PERSISTED sketches — re-merge without raw
  * data. Count-Min merge IS addition (Agarwal et al., PODS'12), so the
  * re-merged sketch is bit-identical to one built over the union. */
class CountMinMergeAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], sk: Seq[Long]): Array[Long] =
    if (sk == null) buf
    else if (buf.isEmpty) sk.toArray
    else {
      require(buf.length == sk.length,
        s"sketch size mismatch: ${buf.length} vs ${sk.length} — differing depth×width")
      var i = 0
      while (i < buf.length) { buf(i) += sk(i); i += 1 }
      buf
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"sketch size mismatch: ${a.length} vs ${b.length} — differing depth×width")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(buf)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMin {

  val DefaultDepth = 4
  val DefaultWidth = 2048

  /** Per-row bucket indices, one per hash row: `pmod(xxhash64(key, d),
    * width)` — codegen'd, and the single source of truth shared by
    * build and estimate. Null key → null vector (skipped by the agg,
    * null estimate). */
  def buckets(key: Column, depth: Int = DefaultDepth,
              width: Int = DefaultWidth): Column =
    when(key.isNotNull, array((0 until depth).map(d =>
      pmod(xxhash64(key, lit(d)), lit(width.toLong))): _*))

  /** Whole-input sketch: ONE row with the `array<bigint>` counter grid
    * (row-major `depth × width`) under `as`. */
  def sketch(df: DataFrame, key: Column, depth: Int = DefaultDepth,
             width: Int = DefaultWidth, as: String = "cm"): DataFrame = {
    val f = udaf(new CountMinAgg(depth, width))
    df.select(buckets(key, depth, width).as("idx")).agg(f(col("idx")).as(as))
  }

  /** Per-group sketches (e.g. one per day/source) for later re-merge. */
  def sketchBy(df: DataFrame, groupCols: Seq[String], key: Column,
               depth: Int = DefaultDepth, width: Int = DefaultWidth,
               as: String = "cm"): DataFrame = {
    val f = udaf(new CountMinAgg(depth, width))
    df.select(groupCols.map(col) :+ buckets(key, depth, width).as("idx"): _*)
      .groupBy(groupCols.map(col): _*).agg(f(col("idx")).as(as))
  }

  /** Merge materialized sketches down to coarser groups without
    * re-reading raw data — the [[Sketches.mergeSketches]] analog. */
  def mergeSketches(df: DataFrame, groupCols: Seq[String],
                    sketchCol: String = "cm"): DataFrame = {
    val f = udaf(new CountMinMergeAgg)
    df.groupBy(groupCols.map(col): _*).agg(f(col(sketchCol)).as(sketchCol))
  }

  /** Point-frequency estimate: `min_d grid[d][h_d(key)]` — depth
    * codegen'd lookups against the sketch column (attach the one-row
    * sketch via a broadcast scalar-attach, the q20 pattern). */
  def estimate(sk: Column, key: Column, depth: Int = DefaultDepth,
               width: Int = DefaultWidth): Column = {
    val rows = (0 until depth).map(d =>
      element_at(sk, (lit(d * width) +
        pmod(xxhash64(key, lit(d)), lit(width.toLong)) + 1).cast("int")))
    when(key.isNotNull, rows.reduce((a, b) => least(a, b)))
  }
}
