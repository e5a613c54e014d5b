package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.events.Windows

/** Event-time windowing t2 queries over the `events` table (additive
  * capability — SURVEY.md §2.6). Batch mode; the same Windows helpers
  * run under Structured Streaming with watermarks.
  *
  * Output timestamps are cast to timestamp_ntz so the written parquet
  * matches the oracle's naive timestamps (session tz is UTC).
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  import QCommon.{t, dec2}

  // secondary-sort: per-user ordered iteration (no bag materialization)
  private val gapSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_events", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("max_gap_us", org.apache.spark.sql.types.LongType)))

  val queries: Map[String, Q] = Map[String, Q](

    // funnel conversion: per user, first signup → first purchase at or
    // after it → within-24h conversion. Per-user aggregation + one
    // equi-join — at 100 TB both aggregations partial-aggregate and the
    // join shuffles by user_id once; no window, no self-cross.
    "q101_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      su.join(pu, Seq("user_id"), "left_outer")
        .groupBy(col("user_id"), col("signup_ts"))
        .agg(min(when(col("p_ts") >= col("signup_ts"), col("p_ts"))).as("first_p"))
        .agg(
          count(lit(1)).as("n_signup_users"),
          sum(when(col("first_p").isNotNull, 1L).otherwise(0L)).as("n_purchased_after"),
          sum(when(col("first_p") <= col("signup_ts") + expr("INTERVAL 24 HOURS"), 1L)
            .otherwise(0L)).as("n_converted_24h"))
    }),

    // retention cohorts: users bucketed by first-seen day, distinct
    // actives per (cohort, day-offset ≤ 7) — the standard cohort grid
    "q102_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("ts"))
      val first = ev.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("cohort"))
      ev.join(first, "user_id")
        .select(col("cohort"),
          datediff(date_trunc("day", col("ts")), col("cohort")).cast("long")
            .as("day_offset"), col("user_id"))
        .filter(col("day_offset") <= 7)
        .groupBy(col("cohort"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(col("cohort").cast("timestamp_ntz").as("cohort"),
          col("day_offset"), col("n_users"))
        .orderBy(col("cohort"), col("day_offset"))
    }),

    // tumbling 1-hour windows per event_type
    "q27_window_tumbling" -> ((s, dir) => {
      Windows.tumbling(t(s, dir, "events"), "ts", "1 hour",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("sum_value")))
        .select(col("window_start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // sliding 1-hour windows, 30-minute slide (global)
    "q28_window_sliding" -> ((s, dir) => {
      Windows.sliding(t(s, dir, "events"), "ts", "1 hour", "30 minutes",
          Seq.empty, Seq(count(lit(1)).as("n")))
        .select(col("window_start").cast("timestamp_ntz").as("window_start"), col("n"))
        .orderBy(col("window_start"))
    }),

    // session windows per user, 30-minute inactivity gap
    "q29_session_window" -> ((s, dir) => {
      Windows.session(t(s, dir, "events"), "ts", "30 minutes",
          Seq(col("user_id")), Seq(count(lit(1)).as("n_events")))
        .select(col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    "q47_secondary_sort" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("user_id"), col("ts"))
      graft.ops.SecondarySort.sortedGroups(e, Seq("user_id"), Seq("ts"), gapSchema) {
        (key, rows) =>
          // null-safe (r17 review): a NULL user_id key passes through
          // as a NULL-keyed output row (SQL GROUP BY semantics —
          // asInstanceOf[Long] coerced it to 0, colliding with a real
          // user 0), and NULL ts rows count but contribute no gap
          // (they sort first, before any epoch math)
          var n = 0L; var prev = Long.MinValue; var maxGap = 0L
          rows.foreach { r =>
            n += 1
            val ts = r.getAs[java.sql.Timestamp](1)
            if (ts != null) {
              val us = math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
              if (prev != Long.MinValue && us - prev > maxGap) maxGap = us - prev
              prev = us
            }
          }
          Iterator.single(org.apache.spark.sql.Row(key.head, n, maxGap))
      }.orderBy(col("user_id"))
    }),

    // as-of join: for each click, the latest purchase at-or-before it
    // by the same user (point-in-time-correct feature attachment; see
    // ops/AsofJoin for the union-window single-shuffle encoding)
    "q86_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.ops.AsofJoin.asof(clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("event_id", "value"), "prior_")
        .select(col("event_id"), col("user_id"),
          col("prior_event_id"), col("prior_value"))
        .orderBy(col("event_id"))
    }),

    // forward as-of join (r14): for each click, the EARLIEST purchase
    // at-or-after it by the same user — the merge_asof 'forward'
    // direction, oracle-checked against DuckDB's native forward ASOF
    // (a.ts <= b.ts); 'nearest' is spec-tested (AsofJoinSpec) since
    // DuckDB has no native form for it
    "q110_asof_forward" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.ops.AsofJoin.asof(clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("event_id", "value"), "next_", direction = "forward")
        .select(col("event_id"), col("user_id"),
          col("next_event_id"), col("next_value"))
        .orderBy(col("event_id"))
    }),

    // range join: per click, errors within ±5 minutes — NO equality
    // key, so the naive plan is a nested loop; ops/RangeJoin buckets
    // the time axis into an equi-join
    "q87_range_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("ts"))
      val errors = e.filter(col("event_type") === "error").select(col("ts"))
      graft.ops.RangeJoin.countWithinRadius(clicks, errors,
          "event_id", "ts", "ts", 300000000L, as = "n_nearby_errors")
        .select(col("event_id"), col("n_nearby_errors"))
        .orderBy(col("event_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q87_range_join" ->
      """SELECT a.event_id, COUNT(b.ts) AS n_nearby_errors
         FROM (SELECT event_id, ts FROM events WHERE event_type = 'click') a
         LEFT JOIN (SELECT ts FROM events WHERE event_type = 'error') b
           ON b.ts BETWEEN a.ts - INTERVAL 5 MINUTE
                       AND a.ts + INTERVAL 5 MINUTE
         GROUP BY 1 ORDER BY 1""",
    "q86_asof_join" ->
      """SELECT a.event_id, a.user_id,
         b.event_id AS prior_event_id, b.value AS prior_value
         FROM (SELECT * FROM events WHERE event_type = 'click') a
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
           ON a.user_id = b.user_id AND a.ts >= b.ts
         ORDER BY a.event_id""",
    "q110_asof_forward" ->
      """SELECT a.event_id, a.user_id,
         b.event_id AS next_event_id, b.value AS next_value
         FROM (SELECT * FROM events WHERE event_type = 'click') a
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
           ON a.user_id = b.user_id AND a.ts <= b.ts
         ORDER BY a.event_id""",
    "q47_secondary_sort" ->
      """SELECT user_id, COUNT(*) AS n_events,
         COALESCE(CAST(MAX(gap) AS BIGINT), 0) AS max_gap_us
         FROM (SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts) AS gap
               FROM events)
         GROUP BY 1 ORDER BY 1""",
    "q101_funnel" ->
      """WITH su AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
         fc AS (SELECT su.user_id, signup_ts,
                  MIN(CASE WHEN e.ts >= signup_ts THEN e.ts END) AS first_p
                FROM su LEFT JOIN events e
                  ON e.user_id = su.user_id AND e.event_type = 'purchase'
                GROUP BY 1, 2)
         SELECT COUNT(*) AS n_signup_users,
           SUM(CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_purchased_after,
           SUM(CASE WHEN first_p <= signup_ts + INTERVAL 24 HOURS
                    THEN 1 ELSE 0 END)::BIGINT AS n_converted_24h
         FROM fc""",
    "q102_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('day', MIN(ts)) AS cohort
                    FROM events GROUP BY 1)
         SELECT cohort,
           datediff('day', cohort, date_trunc('day', e.ts)) AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_users
         FROM events e JOIN f USING (user_id)
         WHERE datediff('day', cohort, date_trunc('day', e.ts)) <= 7
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q27_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         COUNT(*) AS n, (SUM(CAST(value AS DECIMAL(18,2))))::DOUBLE AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q28_window_sliding" ->
      """SELECT window_start, COUNT(*) AS n FROM (
           SELECT UNNEST([
             make_timestamp((epoch_us(ts) // 1800000000) * 1800000000),
             make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000)
           ]) AS window_start FROM events)
         GROUP BY 1 ORDER BY 1""",
    "q29_session_window" ->
      """WITH x AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         y AS (
           SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM x)
         SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
         FROM y GROUP BY user_id, sid
         ORDER BY user_id, session_start"""
  )
}
