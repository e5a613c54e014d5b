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

  /** Stream-stream inner join bounded by an event-time interval: keeps
    * (l, r) pairs sharing the keys with l.ts in [r.ts, r.ts + within).
    * Both sides are watermarked, and the interval condition gives the
    * state store a provable eviction bound — rows older than
    * watermark + within are dropped, so state is O(rate × horizon),
    * not unbounded (the requirement for a 100 TB/day stream). Output
    * columns are prefixed `l_`/`r_` (both sides often share names).
    */
  def streamingIntervalJoin(left: DataFrame, right: DataFrame,
                            leftTs: String, rightTs: String,
                            keys: Seq[String], within: String,
                            delay: String): DataFrame = {
    val l0 = left
      .select(left.columns.toIndexedSeq.map(c => col(c).as("l_" + c)): _*)
      .withWatermark("l_" + leftTs, delay)
    val r0 = right
      .select(right.columns.toIndexedSeq.map(c => col(c).as("r_" + c)): _*)
      .withWatermark("r_" + rightTs, delay)
    val keyCond = keys.map(k => col("l_" + k) === col("r_" + k)).reduce(_ && _)
    val timeCond = col("l_" + leftTs) >= col("r_" + rightTs) &&
      col("l_" + leftTs) < col("r_" + rightTs) + expr(s"INTERVAL $within")
    l0.join(r0, keyCond && timeCond)
  }

  // ------------------------- custom state (flatMapGroupsWithState) ------

  /** Input/output records for the custom stateful sessionizer. */
  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp,
                              n_events: Long, sum_value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)

  /** Custom sessionization with explicit state —
    * `flatMapGroupsWithState` with event-time timeout: emits a session
    * when the gap elapses past the watermark. This is the escape hatch
    * for session logic `session_window` can't express (per-session
    * aggregates beyond count/sum, custom merge rules).
    *
    * Works on a streaming Dataset (append mode). The gap is in
    * milliseconds to keep the state arithmetic explicit.
    */
  def statefulSessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
                         gapMs: Long, delay: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._

    def fn(userId: Long, rows: Iterator[SessionEvent],
           state: GroupState[SessionState]): Iterator[SessionOut] = {
      def emit(s: SessionState) = SessionOut(userId,
        new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last + gapMs),
        s.n, s.sum)
      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).iterator
        state.remove()
        out
      } else {
        // assemble this batch's events into gap-separated sessions,
        // then interval-merge the OPEN STATE session into the sorted
        // list. The old single-cursor fold compared each event only
        // against the running session's `last` with a SIGNED delta, so
        // a within-watermark event OLDER than the open session (late
        // rows still reach fn) merged unconditionally — wrong
        // membership and a session_start after its own events (r17
        // review). Interval merge gives the session_window semantics:
        // an old event extends start backward iff it is within the
        // gap, and otherwise forms its own (already gapped-out,
        // immediately emitted) session.
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        val sessions = scala.collection.mutable.ArrayBuffer.empty[SessionState]
        sorted.foreach { e =>
          val t = e.ts.getTime
          sessions.lastOption match {
            case Some(s) if t - s.last < gapMs =>
              sessions(sessions.length - 1) =
                SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value)
            case _ => sessions += SessionState(t, t, 1, e.value)
          }
        }
        val merged = scala.collection.mutable.ArrayBuffer.empty[SessionState]
        (state.getOption.toSeq ++ sessions).sortBy(_.start).foreach { s =>
          merged.lastOption match {
            case Some(p) if s.start - p.last < gapMs =>
              merged(merged.length - 1) = SessionState(p.start,
                math.max(p.last, s.last), p.n + s.n, p.sum + s.sum)
            case _ => merged += s
          }
        }
        // all but the newest are gap-closed by construction; the
        // newest stays open. Its natural timeout can sit at or below
        // the current watermark when a late event re-extended old
        // state while other keys advanced the watermark — Spark
        // rejects such a timestamp, so clamp strictly above (the
        // session then times out on the next watermark move, which is
        // exactly when it becomes emittable).
        if (merged.isEmpty) Iterator.empty
        else {
          val open = merged.last
          state.update(open)
          state.setTimeoutTimestamp(
            math.max(open.last + gapMs, state.getCurrentWatermarkMs() + 1))
          merged.init.map(emit).iterator
        }
      }
    }

    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
      .toDF()
  }
}
