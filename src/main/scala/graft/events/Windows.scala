package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table — additive capability
  * (the reference is strictly batch, SURVEY.md §2.6). Batch-first, with
  * the same expressions usable under Structured Streaming: the
  * `streaming*` variants add watermarks and are ready for
  * `readStream → transform → writeStream`.
  */
object Windows {

  /** Tumbling event-time windows: groupBy(window(ts, size)) + aggs.
    * Output carries window_start/window_end as plain columns.
    */
  def tumbling(df: DataFrame, tsCol: String, size: String,
               keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val w = window(col(tsCol), size)
    df.groupBy((w +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Sliding windows (size, slide): each event lands in size/slide
    * windows; Spark expands via the native window generator. */
  def sliding(df: DataFrame, tsCol: String, size: String, slide: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val w = window(col(tsCol), size, slide)
    df.groupBy((w +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Session windows with an inactivity gap, per key: merges events
    * whose [ts, ts+gap) intervals overlap. session_end = last event +
    * gap (Spark session_window semantics).
    */
  def session(df: DataFrame, tsCol: String, gap: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val w = session_window(col(tsCol), gap)
    df.groupBy((w +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
  }

  /** Streaming tumbling aggregation with a watermark — append-mode
    * ready: `readStream → streamingTumbling → writeStream`. */
  def streamingTumbling(stream: DataFrame, tsCol: String, size: String,
                        delay: String, keys: Seq[Column],
                        aggs: Seq[Column]): DataFrame =
    tumbling(stream.withWatermark(tsCol, delay), tsCol, size, keys, aggs)

  /** Streaming sessionization with watermarked state cleanup. */
  def streamingSession(stream: DataFrame, tsCol: String, gap: String,
                       delay: String, keys: Seq[Column],
                       aggs: Seq[Column]): DataFrame =
    session(stream.withWatermark(tsCol, delay), tsCol, gap, keys, aggs)

  /** Streaming dedup by key within the watermark horizon. */
  def streamingDedup(stream: DataFrame, tsCol: String, delay: String,
                     keyCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
