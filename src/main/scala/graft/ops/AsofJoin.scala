package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (point-in-time) join — for each left row, attach
  * the payload of the right row with the greatest right-time ≤ the
  * left row's time among rows sharing the join keys (backward,
  * inclusive — the DuckDB `ASOF JOIN`/pandas `merge_asof` default),
  * or nulls when no such row exists (LEFT semantics).
  *
  * The reference has no as-of operator (time-series joins in Pig are
  * written as COGROUP + nested ORDER/LIMIT per key, materializing the
  * bag); this is the additive capability a feature-store /
  * training-data pipeline needs for point-in-time-correct feature
  * attachment without future leakage.
  *
  * Scale shape — the canonical union-window encoding, NOT a per-key
  * bag sort and NOT a range cross-join:
  *
  *   1. tag right rows side=0 carrying a payload struct, left rows
  *      side=1 with a null payload, union by name;
  *   2. ONE hash shuffle on the keys + ONE local sort on
  *      (time, side, payload);
  *   3. `last(payload, ignoreNulls) OVER (PARTITION BY keys ORDER BY
  *      time, side, payload ROWS UNBOUNDED PRECEDING..CURRENT ROW)` —
  *      each left row sees exactly the latest right payload at-or-
  *      before its time (right sorts before left at equal times,
  *      giving the inclusive bound);
  *   4. keep side=1, unpack the struct.
  *
  * Cost is a single Exchange + sort over |L|+|R| rows — no row blowup,
  * no per-key iteration. Skew envelope: a window partition is one
  * task's sort (AQE does not split window partitions), so a single
  * key holding ~10⁸+ rows serializes on that key; the refinement for
  * that regime is to sub-partition by (key, coarse time bucket) and
  * prefix-scan the tiny per-bucket "last right payload" summary per
  * key before the window — not needed at current scales, documented
  * here so the bound is explicit.
  * Ties on right-time within a key break deterministically to the
  * greatest payload struct (lexicographic by field order), so results
  * are reproducible and oracle-checkable even with duplicate
  * timestamps.
  */
object AsofJoin {

  /** @param payload right-side columns to attach (become
    *        `prefix<name>`, null when no match)
    *  @param prefix  prefix for attached columns (avoids collision on
    *        self-joins)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(payload.nonEmpty, "as-of join needs at least one payload column")

    val leftCols = left.columns.toSeq
    val p = struct(payload.map(col).toIndexedSeq: _*)

    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("graft_asof_t")
        :+ lit(0).as("graft_asof_side") :+ p.as("graft_asof_p")).toIndexedSeq: _*)
    val l = left
      .withColumn("graft_asof_t", col(leftTime))
      .withColumn("graft_asof_side", lit(1))

    // unionByName fills l-only columns with typed nulls on the right
    // side and graft_asof_p with nulls on the left side
    val u = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(col("graft_asof_t"), col("graft_asof_side"), col("graft_asof_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("graft_asof_m",
      last(col("graft_asof_p"), ignoreNulls = true).over(w))

    val out: Seq[Column] = leftCols.map(col) ++
      payload.map(c => col("graft_asof_m").getField(c).as(prefix + c))
    matched.filter(col("graft_asof_side") === 1).select(out.toIndexedSeq: _*)
  }
}
