package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.events.Windows

class WindowsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 00:05:00"), 1.0),
    (1L, ts("2024-01-01 00:20:00"), 2.0),
    (1L, ts("2024-01-01 01:10:00"), 3.0), // > 30 min gap → new session
    (2L, ts("2024-01-01 00:59:59"), 4.0)
  ).toDF("user_id", "ts", "value")

  test("tumbling windows bucket by event time") {
    val got = Windows.tumbling(events, "ts", "1 hour", Seq.empty,
        Seq(count(lit(1)).as("n")))
      .select($"window_start".cast("string"), $"n").as[(String, Long)]
      .collect().toMap
    assert(got == Map("2024-01-01 00:00:00" -> 3L, "2024-01-01 01:00:00" -> 1L))
  }

  test("sliding windows place each event in size/slide windows") {
    val one = Seq((1L, ts("2024-01-01 00:40:00"))).toDF("id", "ts")
    val got = Windows.sliding(one, "ts", "1 hour", "30 minutes", Seq.empty,
        Seq(count(lit(1)).as("n")))
      .select($"window_start".cast("string")).as[String].collect().toSet
    assert(got == Set("2024-01-01 00:00:00", "2024-01-01 00:30:00"))
  }

  test("session windows merge by gap; end = last event + gap") {
    val got = Windows.session(events, "ts", "30 minutes", Seq($"user_id"),
        Seq(count(lit(1)).as("n")))
      .select($"user_id", $"session_start".cast("string"),
        $"session_end".cast("string"), $"n")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01 00:05:00", "2024-01-01 00:50:00", 2L),
      (1L, "2024-01-01 01:10:00", "2024-01-01 01:40:00", 1L),
      (2L, "2024-01-01 00:59:59", "2024-01-01 01:29:59", 1L)))
  }

  test("streaming tumbling aggregation with watermark runs end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = Windows.streamingTumbling(
      input.toDF().toDF("ts", "value"), "ts", "1 hour", "10 minutes",
      Seq.empty, Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((ts("2024-01-01 00:05:00"), 1.0), (ts("2024-01-01 00:55:00"), 2.0))
      q.processAllAvailable()
      val got = spark.table("win_agg")
        .select($"window_start".cast("string"), $"n").as[(String, Long)]
        .collect().toMap
      assert(got == Map("2024-01-01 00:00:00" -> 2L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer closes sessions past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Windows.SessionEvent]
    val sessions = Windows.statefulSessionize(input.toDS(),
      gapMs = 30 * 60 * 1000L, delay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("state_sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then a big gap
      input.addData(
        Windows.SessionEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
        Windows.SessionEvent(1L, ts("2024-01-01 00:05:00"), 2.0))
      q.processAllAvailable()
      // advance event time far past the gap: the session must close
      input.addData(Windows.SessionEvent(1L, ts("2024-01-01 02:00:00"), 5.0))
      q.processAllAvailable()
      input.addData(Windows.SessionEvent(2L, ts("2024-01-01 06:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("state_sessions")
        .select($"user_id", $"session_start".cast("string"),
          $"n_events", $"sum_value")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got.contains((1L, "2024-01-01 00:00:00", 2L, 3.0)))
    } finally q.stop()
  }

  test("statefulSessionize: a late event older than the open session never absorbs into it (r17 review)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Windows.SessionEvent]
    val sessions = Windows.statefulSessionize(input.toDS(),
      gapMs = 30 * 60 * 1000L, delay = "2 hours")
    val q = sessions.writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      // u1 and u3 open sessions at 03:00
      input.addData(
        Windows.SessionEvent(1L, ts("2024-01-01 03:00:00"), 1.0),
        Windows.SessionEvent(3L, ts("2024-01-01 03:00:00"), 1.0))
      q.processAllAvailable()
      // late but within-watermark events: u1's is 90 min BEFORE its
      // open session (beyond the gap — its own session, emitted at
      // once); u3's is 15 min before (within the gap — must merge and
      // extend session_start BACKWARD). The old signed-delta fold
      // absorbed u1's into the 03:00 session with start unchanged.
      input.addData(
        Windows.SessionEvent(1L, ts("2024-01-01 01:30:00"), 7.0),
        Windows.SessionEvent(3L, ts("2024-01-01 02:45:00"), 7.0))
      q.processAllAvailable()
      // advance event time far past the gap: remaining sessions close
      input.addData(Windows.SessionEvent(2L, ts("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("late_sessions")
        .select($"user_id", $"session_start".cast("string"),
          $"n_events", $"sum_value")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got.contains((1L, "2024-01-01 01:30:00", 1L, 7.0)), got)
      assert(got.contains((1L, "2024-01-01 03:00:00", 1L, 1.0)), got)
      assert(got.contains((3L, "2024-01-01 02:45:00", 2L, 8.0)), got)
    } finally q.stop()
  }

  test("streaming session window merges events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val sess = Windows.streamingSession(
      input.toDF().toDF("user_id", "ts", "value"), "ts", "30 minutes",
      "10 minutes", Seq($"user_id"), Seq(count(lit(1)).as("n")))
    val q = sess.writeStream.format("memory").queryName("stream_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:00:00"), 1.0),
        (1L, ts("2024-01-01 00:10:00"), 2.0))
      q.processAllAvailable()
      // advance the watermark far past the gap so the session emits
      input.addData((2L, ts("2024-01-01 05:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("stream_sessions")
        .select($"user_id", $"session_start".cast("string"), $"n")
        .as[(Long, String, Long)].collect().toSet
      assert(got.contains((1L, "2024-01-01 00:00:00", 2L)))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops later duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val dedup = Windows.streamingDedup(
      input.toDF().toDF("event_id", "ts"), "ts", "1 hour", Seq("event_id"))
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:01:00")),
        (2L, ts("2024-01-01 00:02:00")))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("streaming curation: low-quality rows filtered, watermark-bounded exact dedup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val highQ = (1 to 120).map(i => s"w$i").mkString(" ") // diverse, long → quality ≥ 0.5
    val lowQ = "a a a a a"                                // repetitive, short → filtered
    val out = graft.llm.Curate.streamingCurate(
      input.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "1 hour")
    // internal fingerprint column must not leak into the curated schema
    assert(out.columns.toSeq == Seq("doc_id", "ts", "text"))
    val q = out.writeStream.format("memory").queryName("curate_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:00:00"), highQ),
        (2L, ts("2024-01-01 00:01:00"), highQ),  // duplicate text within watermark
        (3L, ts("2024-01-01 00:02:00"), lowQ))   // quality-filtered
      q.processAllAvailable()
      val got = spark.table("curate_stream").select($"doc_id").as[Long].collect().toSet
      assert(got == Set(1L))
    } finally q.stop()
  }

  test("stream-stream interval join matches pairs and bounds state by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = Windows.streamingIntervalJoin(
      clicks.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "value"),
      "ts", "ts", Seq("user_id"), "30 MINUTES", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("interval_join")
      .outputMode(OutputMode.Append()).start()
    try {
      purchases.addData((1L, ts("2024-01-01 00:00:00"), 9.99))
      clicks.addData(
        (1L, ts("2024-01-01 00:10:00")),  // inside [purchase, +30min) -> match
        (1L, ts("2024-01-01 00:40:00")),  // past the interval -> no match
        (2L, ts("2024-01-01 00:10:00"))) // different user -> no match
      q.processAllAvailable()
      // advance both watermarks so matched rows emit in append mode
      clicks.addData((8L, ts("2024-01-01 06:00:00")))
      purchases.addData((9L, ts("2024-01-01 06:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("interval_join")
        .select($"l_user_id", $"l_ts".cast("string"), $"r_value")
        .as[(Long, String, Double)].collect().toSet
      assert(got == Set((1L, "2024-01-01 00:10:00", 9.99)))
    } finally q.stop()
  }
}

/** Batch/streaming parity: the same tumbling aggregation over the real
  * events table via the file-source stream equals the batch result. */
class StreamingParitySpec extends SparkSuite {
  import spark.implicits._

  test("file-source streaming tumbling agg equals batch on events sf0.001") {
    import org.apache.spark.sql.functions._
    // stage the single events file in its own dir (streaming sources read dirs)
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    // declare the file's own ts encoding (timestamp[us] → NTZ under
    // tz-naive inference), then normalize exactly as Tables.load does
    val tsType = spark.read.parquet(dir.toString).schema("ts").dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", tsType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    val stream = tsType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    val agg = Windows.streamingTumbling(stream, "ts", "1 hour", "10 minutes",
      Seq(col("event_type")), Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("parity_out")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val got = spark.table("parity_out")
      .groupBy("window_start", "event_type").agg(max("n").as("n")) // last update wins
      .select($"window_start".cast("string"), $"event_type", $"n")
      .as[(String, String, Long)].collect().toSet
    val want = Windows.tumbling(Tables.load(spark, "/root/testdata/sf0.001", "events"),
        "ts", "1 hour", Seq(col("event_type")), Seq(count(lit(1)).as("n")))
      .select($"window_start".cast("string"), $"event_type", $"n")
      .as[(String, String, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }
}
