package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (point-in-time) join — for each left row, attach
  * the payload of the matching right row among rows sharing the join
  * keys, or nulls when no such row exists (LEFT semantics). Directions
  * (the pandas `merge_asof` surface):
  *
  *  - `backward` (default, the DuckDB `ASOF JOIN` semantics): the
  *    right row with the GREATEST right-time ≤ the left time;
  *  - `forward`: the right row with the SMALLEST right-time ≥ the
  *    left time;
  *  - `nearest`: whichever of the two is closer in time (equal
  *    distance breaks to backward — no future leakage on ties).
  *
  * The reference has no as-of operator (time-series joins in Pig are
  * written as COGROUP + nested ORDER/LIMIT per key, materializing the
  * bag); this is the additive capability a feature-store /
  * training-data pipeline needs for point-in-time-correct feature
  * attachment.
  *
  * Scale shape — the canonical union-window encoding, NOT a per-key
  * bag sort and NOT a range cross-join:
  *
  *   1. tag right rows side=0 carrying a (time, payload) struct, left
  *      rows side=1 with a null struct, union by name;
  *   2. ONE hash shuffle on the keys + a local sort on
  *      (time, side, payload) — ascending for backward, time/payload
  *      descending for forward (right still sorts before left at equal
  *      times, giving the inclusive bound in both directions);
  *   3. `last(match_struct, ignoreNulls) OVER (PARTITION BY keys …
  *      ROWS UNBOUNDED PRECEDING..CURRENT ROW)` — each left row sees
  *      exactly its direction's match;
  *   4. keep side=1, unpack the struct. `nearest` runs BOTH window
  *      orders over the same exchange (one shuffle, two local sorts)
  *      and picks the closer match per row.
  *
  * Cost is a single Exchange + sort over |L|+|R| rows — no row blowup,
  * no per-key iteration. Skew envelope: a window partition is one
  * task's sort (AQE does not split window partitions), so a single
  * key holding ~10⁸+ rows serializes on that key. For that regime pass
  * `bucketWidth` — the two-level form sub-partitions every key by a
  * coarse time bucket, windows WITHIN (key, bucket), and prefix-scans
  * the tiny per-bucket "boundary right payload" summary stream per key
  * (latest for backward, earliest for forward), so the hot key's sort
  * splits across time buckets and the only per-key-serial work is one
  * row per non-empty bucket. All three directions support it.
  *
  * Ties on right-time within a key break deterministically — backward
  * to the GREATEST payload struct, forward to the SMALLEST
  * (mirror-symmetric, lexicographic by field order) — so results are
  * reproducible and oracle-checkable even with duplicate timestamps,
  * identically in the single-window and bucketed forms (the bucket
  * summaries are max/min(struct(t, payload)), the same order the
  * windows sort by).
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
    *  @param direction "backward" | "forward" | "nearest"
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           payload: Seq[String], prefix: String = "asof_",
           bucketWidth: Option[Long] = None,
           direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(bucketWidth.forall(_ > 0), "bucketWidth must be positive")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")

    val leftCols = left.columns.toSeq
    val p = struct(payload.map(col).toIndexedSeq: _*)

    // a right row with NULL time matches nothing (the DuckDB ASOF
    // rule): drop it here — otherwise null-first/null-last window
    // ordering would let it surface as a spurious "earliest"/"latest"
    // match in one of the directions
    val r = right.filter(col(rightTime).isNotNull).select(
      (keys.map(col) :+ col(rightTime).as("graft_asof_t")
        :+ lit(0).as("graft_asof_side") :+ p.as("graft_asof_p")).toIndexedSeq: _*)
    val l = left
      .withColumn("graft_asof_t", col(leftTime))
      .withColumn("graft_asof_side", lit(1))

    // unionByName fills l-only columns with typed nulls on the right
    // side and graft_asof_p with nulls on the left side
    val u0 = l.unionByName(r, allowMissingColumns = true)
    // the carried match value: whole-struct null on left rows so the
    // window's ignoreNulls skips them; carries the matched TIME too
    // (nearest needs it for the distance comparison)
    val u = u0.withColumn("graft_asof_v",
      when(col("graft_asof_side") === 0,
        struct(col("graft_asof_t").as("t"), col("graft_asof_p").as("p"))))

    // exact floor division via long+decimal (double division rounds for
    // large longs; `div` truncates toward zero for negative times).
    // A null left time gets the SENTINEL bucket so the row survives the
    // carry join (LEFT semantics — its payload is nulled below anyway);
    // null-time right rows were already filtered out.
    def bucketOf(t: Column): Column = coalesce(
      floor(t.cast("long").cast("decimal(38,0)") / lit(bucketWidth.getOrElse(1L)))
        .cast("long"),
      lit(Long.MinValue))

    // bucket column + the (key, bucket) universe are direction-
    // independent: computed ONCE and shared by both of nearest's
    // attachDir passes (each pass previously re-ran the distinct)
    val uB = bucketWidth.map(_ => u.withColumn("graft_asof_b", bucketOf(col("graft_asof_t"))))
    val allBucketsShared = uB.map { d =>
      d.select((keys :+ "graft_asof_b").map(col).toIndexedSeq: _*).distinct()
    }

    /** Adds `graft_asof_m_<dir>` = struct(t, p) of the dir's match. */
    def attachDir(df0: DataFrame, dir: String): DataFrame = {
      val back = dir == "backward"
      val ord: Seq[Column] =
        if (back) Seq(col("graft_asof_t").asc, col("graft_asof_side").asc,
          col("graft_asof_p").asc)
        else Seq(col("graft_asof_t").desc, col("graft_asof_side").asc,
          col("graft_asof_p").desc)
      val out = s"graft_asof_m_$dir"
      bucketWidth match {
        case None =>
          val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
            .orderBy(ord: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          df0.withColumn(out, last(col("graft_asof_v"), ignoreNulls = true).over(w))

        case Some(_) =>
          val df = df0
          val keyB = (keys :+ "graft_asof_b").map(col).toIndexedSeq
          // per-(key, bucket) boundary summary: the direction's best
          // right row in the bucket — max(struct) IS the backward
          // (t, payload) order restricted to right rows; min(struct)
          // the forward one
          val summAgg = if (back) max(col("graft_asof_v")) else min(col("graft_asof_v"))
          val summ = df.filter(col("graft_asof_side") === 0)
            .groupBy(keyB: _*).agg(summAgg.as("graft_asof_s"))
          // carry-in per (key, bucket): the boundary summary of the
          // nearest preceding (backward) / following (forward)
          // non-empty bucket — the per-key window runs over the
          // bucket-summary stream (≤ one row per bucket), so a hot
          // key's serial work is O(#buckets), not O(#rows)
          val wCarry = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
            .orderBy(if (back) col("graft_asof_b").asc else col("graft_asof_b").desc)
            .rowsBetween(Window.unboundedPreceding, -1)
          // null-SAFE key equality on BOTH carry-side joins: a null
          // join key must behave as its own group (the single-window
          // form does, via partitionBy which groups nulls together —
          // <=> mirrors that grouping exactly). The summary attach
          // needs it too, or null-key buckets would never receive
          // their boundary summaries.
          val summR = summ.select(
            (keys.map(k => col(k).as(s"graft_asof_sk_$k"))
              :+ col("graft_asof_b").as("graft_asof_sb")
              :+ col("graft_asof_s")).toIndexedSeq: _*)
          val summCond = keys.map(k => col(k) <=> col(s"graft_asof_sk_$k"))
            .reduce(_ && _) && col("graft_asof_b") === col("graft_asof_sb")
          val carries = allBucketsShared.get
            .join(summR, summCond, "left")
            .drop((keys.map(k => s"graft_asof_sk_$k") :+ "graft_asof_sb"): _*)
            .withColumn("graft_asof_c",
              last(col("graft_asof_s"), ignoreNulls = true).over(wCarry))
            .select((keys.map(k => col(k).as(s"graft_asof_ck_$k"))
              :+ col("graft_asof_b").as("graft_asof_cb")
              :+ col("graft_asof_c").as(s"${out}_carry")).toIndexedSeq: _*)
          val joinCond = keys.map(k => col(k) <=> col(s"graft_asof_ck_$k"))
            .reduce(_ && _) && col("graft_asof_b") === col("graft_asof_cb")
          // main window WITHIN (key, bucket): splits the hot key's
          // sort across buckets; no within-bucket match falls back to
          // the bucket's carry-in
          val wIn = Window.partitionBy(keyB: _*)
            .orderBy(ord: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          df.withColumn(s"${out}_in",
              last(col("graft_asof_v"), ignoreNulls = true).over(wIn))
            .join(carries, joinCond)
            .withColumn(out, coalesce(col(s"${out}_in"), col(s"${out}_carry")))
            .drop((keys.map(k => s"graft_asof_ck_$k")
              ++ Seq("graft_asof_cb", s"${out}_in", s"${out}_carry")): _*)
      }
    }

    val base = uB.getOrElse(u)
    val withM = direction match {
      case "nearest" => attachDir(attachDir(base, "backward"), "forward")
      case d => attachDir(base, d)
    }
    val m: Column = direction match {
      case "nearest" =>
        val b = col("graft_asof_m_backward")
        val f = col("graft_asof_m_forward")
        // EXACT distance comparison in decimal — double rounds above
        // 2^53 and could hand a true tie to the forward (future) side
        val t = col("graft_asof_t").cast("decimal(38,6)")
        // both distances are ≥ 0 by construction; equal distance → the
        // backward match (no future leakage on ties)
        when(b.isNull, f).when(f.isNull, b)
          .when(t - b.getField("t").cast("decimal(38,6)")
            <= f.getField("t").cast("decimal(38,6)") - t, b)
          .otherwise(f)
      case d => col(s"graft_asof_m_$d")
    }

    // a LEFT row with NULL time has no as-of position: null payload
    // regardless of direction (desc ordering would otherwise park it
    // after every right row and hand it the forward-minimum match)
    val mSafe = when(col("graft_asof_t").isNotNull, m)
    val out: Seq[Column] = leftCols.map(col) ++
      payload.map(c => mSafe.getField("p").getField(c).as(prefix + c))
    withM.filter(col("graft_asof_side") === 1).select(out.toIndexedSeq: _*)
  }
}
