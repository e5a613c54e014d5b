package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
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

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)
  private def dec2(c: Column) = c.cast("decimal(18,2)")

  val queries: Map[String, Q] = Map(

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
    })
  )

  val oracleSql: Map[String, String] = Map(
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
