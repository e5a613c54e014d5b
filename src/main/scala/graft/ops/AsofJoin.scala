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
  * key holding ~10⁸+ rows serializes on that key. For that regime pass
  * `bucketWidth` — the two-level form sub-partitions every key by a
  * coarse time bucket, windows WITHIN (key, bucket), and prefix-scans
  * the tiny per-bucket "latest right payload" summary stream per key,
  * so the hot key's sort splits across time buckets and the only
  * per-key-serial work is one row per non-empty bucket.
  *
  * Ties on right-time within a key break deterministically to the
  * greatest payload struct (lexicographic by field order), so results
  * are reproducible and oracle-checkable even with duplicate
  * timestamps — identical in both forms (the bucket summary is
  * `max(struct(t, payload))`, the same (t, payload) order the window
  * sorts by).
  */
object AsofJoin {

  /** @param payload right-side columns to attach (become
    *        `prefix<name>`, null when no match)
    *  @param prefix  prefix for attached columns (avoids collision on
    *        self-joins)
    *  @param bucketWidth hot-key hatch: when set, sub-partition every
    *        key by `floor(time / bucketWidth)` (time read as a long —
    *        native units for numeric time columns, SECONDS for
    *        timestamps) and run the two-level plan described above.
    *        Pick a width giving ~10³–10⁴ buckets over the hot key's
    *        time range so no (key, bucket) cell exceeds one task's
    *        comfortable sort size.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           payload: Seq[String], prefix: String = "asof_",
           bucketWidth: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(bucketWidth.forall(_ > 0), "bucketWidth must be positive")

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

    val out: Seq[Column] = leftCols.map(col) ++
      payload.map(c => col("graft_asof_m").getField(c).as(prefix + c))

    bucketWidth match {
      case None =>
        val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
          .orderBy(col("graft_asof_t"), col("graft_asof_side"), col("graft_asof_p"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val matched = u.withColumn("graft_asof_m",
          last(col("graft_asof_p"), ignoreNulls = true).over(w))
        matched.filter(col("graft_asof_side") === 1).select(out.toIndexedSeq: _*)

      case Some(width) =>
        // exact floor division via decimal (double division rounds for
        // large longs; `div` truncates toward zero for negative times)
        def bucketOf(t: Column): Column =
          floor(t.cast("long").cast("decimal(38,0)") / lit(width)).cast("long")
        val ub = u.withColumn("graft_asof_b", bucketOf(col("graft_asof_t")))

        // per-(key, bucket) "latest right payload" summary: one row per
        // non-empty bucket; max(struct(t, payload)) IS the window's
        // (t, side, payload) order restricted to right rows (side=0)
        val keyB = (keys :+ "graft_asof_b").map(col).toIndexedSeq
        val summ = ub.filter(col("graft_asof_side") === 0)
          .groupBy(keyB: _*)
          .agg(max(struct(col("graft_asof_t"), col("graft_asof_p"))).as("graft_asof_s"))

        // carry-in per (key, bucket): the summary of the latest
        // PRECEDING non-empty bucket — the per-key window now runs over
        // the bucket-summary stream (≤ one row per bucket), so a hot
        // key's serial work is O(#buckets), not O(#rows)
        val allBuckets = ub.select(keyB: _*).distinct()
        val wCarry = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
          .orderBy(col("graft_asof_b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val carries = allBuckets
          .join(summ, keys :+ "graft_asof_b", "left")
          .withColumn("graft_asof_c",
            last(col("graft_asof_s"), ignoreNulls = true).over(wCarry))
          .select((keyB :+ col("graft_asof_c").getField("graft_asof_p")
            .as("graft_asof_carry")).toIndexedSeq: _*)

        // main window WITHIN (key, bucket): splits the hot key's sort
        // across buckets; a left row with no within-bucket match falls
        // back to the bucket's carry-in
        val wIn = Window.partitionBy(keyB: _*)
          .orderBy(col("graft_asof_t"), col("graft_asof_side"), col("graft_asof_p"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val matched = ub
          .withColumn("graft_asof_in",
            last(col("graft_asof_p"), ignoreNulls = true).over(wIn))
          .join(carries, keys :+ "graft_asof_b")
          .withColumn("graft_asof_m",
            coalesce(col("graft_asof_in"), col("graft_asof_carry")))
        matched.filter(col("graft_asof_side") === 1).select(out.toIndexedSeq: _*)
    }
  }
}
