package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

/** Structured Streaming semantics (G12) under MemoryStream: window
  * aggregation across micro-batches, watermark late-data drop,
  * watermark-bounded dedup, and arbitrary keyed state.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def processAll(q: org.apache.spark.sql.streaming
      .StreamingQuery): Unit = {
    q.processAllAvailable()
  }

  test("tumbling agg with watermark drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val events = in.toDF().toDF("ts", "key", "value")
    val out = StreamOps.tumblingAgg(events, "ts", "key",
      "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("tumble")
      .outputMode("update").start()

    in.addData((ts("2024-01-01 00:01:00"), 1L, 1.0),
      (ts("2024-01-01 00:04:00"), 1L, 2.0))
    processAll(q)
    // advance watermark far past the first window…
    in.addData((ts("2024-01-01 01:00:00"), 1L, 5.0))
    processAll(q)
    // …then a late event for the closed 00:00 window: dropped
    in.addData((ts("2024-01-01 00:02:00"), 1L, 100.0))
    processAll(q)
    q.stop()

    val rows = spark.table("tumble")
      .select(date_format($"window.start", "HH:mm").as("w"), $"n",
        $"sum_value")
      .as[(String, Long, Double)].collect().toSet
    assert(rows.contains(("00:00", 2L, 3.0))) // late 100.0 not added
    assert(!rows.exists(r => r._1 == "00:00" && r._3 > 3.0))
    assert(rows.contains(("01:00", 1L, 5.0)))
  }

  test("dropDuplicatesWithinWatermark suppresses dups inside the window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val out = StreamOps.dedupWithinWatermark(
      in.toDF().toDF("ts", "k"), "ts", "10 minutes", Seq("k"))
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    in.addData((ts("2024-01-01 00:00:00"), "a"),
      (ts("2024-01-01 00:01:00"), "a"),
      (ts("2024-01-01 00:02:00"), "b"))
    processAll(q)
    in.addData((ts("2024-01-01 00:03:00"), "a")) // still within watermark
    processAll(q)
    q.stop()
    val ks = spark.table("dedup").select($"k").as[String].collect()
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(ks == Map("a" -> 1, "b" -> 1))
  }

  test("session_window groups by gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val events = in.toDF().toDF("ts", "user_id", "value")
    val out = StreamOps.sessionAgg(events, "ts", "user_id",
      "5 minutes", "1 minute")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    in.addData(
      (ts("2024-01-01 00:00:00"), 1L, 1.0),
      (ts("2024-01-01 00:03:00"), 1L, 1.0), // same session (3m gap)
      (ts("2024-01-01 00:20:00"), 1L, 1.0)) // new session
    processAll(q)
    // push watermark forward so sessions finalize (append mode)
    in.addData((ts("2024-01-01 02:00:00"), 9L, 0.0))
    processAll(q)
    q.stop()
    val sessions = spark.table("sess")
      .filter($"user_id" === 1L)
      .select($"n_events".as[Long]).collect().sorted.toSeq
    assert(sessions == Seq(1L, 2L))
  }

  test("mapGroupsWithState accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val out = StreamOps.runningCounts(in.toDS())
    val q = out.writeStream.format("memory").queryName("counts")
      .outputMode("update").start()
    in.addData((1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:01:00")), (2L, ts("2024-01-01 00:00:30")))
    processAll(q)
    in.addData((1L, ts("2024-01-01 00:05:00")))
    processAll(q)
    q.stop()
    val last = spark.table("counts")
      .groupBy($"key").agg(max($"n").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(last == Map(1L -> 3L, 2L -> 1L))
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val out = StreamOps.sessionizeWithState(in.toDS(),
      gapMs = 5 * 60 * 1000L)
    val q = out.writeStream.format("memory").queryName("fsess")
      .outputMode("append").start()
    in.addData((1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:02:00")))
    processAll(q)
    // jump event time far forward → watermark passes, session times out
    in.addData((1L, ts("2024-01-01 03:00:00")))
    processAll(q)
    in.addData((1L, ts("2024-01-01 06:00:00")))
    processAll(q)
    q.stop()
    val done = spark.table("fsess")
      .select($"nEvents".as[Long]).collect().toSeq
    assert(done.contains(2L)) // first session (2 events) closed
  }

  test("sessionPathsStream emits q148's per-session grams as sessions close") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val out = StreamOps.sessionPathsStream(in.toDS(),
      gapMs = 5 * 60 * 1000L, n = 3)
    val q = out.writeStream.format("memory").queryName("spaths")
      .outputMode("append").start()
    // user 1's first session SPANS two micro-batches (a,b then c,d);
    // user 2 has a 3-event session in batch 1
    in.addData(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:02:00"), 2L, "b"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "x"),
      (2L, ts("2024-01-01 00:01:00"), 4L, "y"),
      (2L, ts("2024-01-01 00:02:00"), 5L, "z"))
    processAll(q)
    in.addData(
      (1L, ts("2024-01-01 00:03:00"), 6L, "c"),
      (1L, ts("2024-01-01 00:04:00"), 7L, "d"))
    processAll(q)
    // in-batch gap: the next user-1 event is > 5 min after "d", so
    // the first session closes at the gap with grams a>b>c, b>c>d —
    // crucially NOT d>e>f spanning the gap
    in.addData(
      (1L, ts("2024-01-01 01:00:00"), 8L, "e"),
      (1L, ts("2024-01-01 01:01:00"), 9L, "f"))
    processAll(q)
    // jump event time far forward for both keys → watermark closes
    // the remaining open sessions
    in.addData((1L, ts("2024-01-01 09:00:00"), 10L, "g"),
      (2L, ts("2024-01-01 09:00:00"), 11L, "g"))
    processAll(q)
    in.addData((1L, ts("2024-01-01 18:00:00"), 12L, "h"),
      (2L, ts("2024-01-01 18:00:00"), 13L, "h"))
    processAll(q)
    q.stop()

    val sessions = spark.table("spaths")
      .select($"key", $"nEvents", $"paths")
      .as[(Long, Long, Seq[String])].collect().toSeq
    // user 1 session 1 crossed the micro-batch boundary intact
    assert(sessions.exists { case (k, ne, p) =>
      k == 1L && ne == 4L && p == Seq("a>b>c", "b>c>d") },
      s"cross-batch session wrong: $sessions")
    // user 2's batch-1 session closed by watermark with one gram
    assert(sessions.exists { case (k, ne, p) =>
      k == 2L && ne == 3L && p == Seq("x>y>z") }, sessions.toString)
    // no gram spans the 56-minute gap
    assert(!sessions.exists(_._3.exists(_.contains("d>e"))),
      s"gram spanned an inactivity gap: $sessions")
    // sub-n sessions emit zero grams (e.g. the 2-event e,f session)
    assert(sessions.exists { case (k, ne, p) =>
      k == 1L && ne == 2L && p.isEmpty }, sessions.toString)

    // closed-session grams match the BATCH operator on the same
    // events (restricted to sessions the stream has closed)
    val batchPaths = graft.operators.Journeys.topPathsSessionized(
        Seq(
          (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
          (1L, ts("2024-01-01 00:02:00"), 2L, "b"),
          (2L, ts("2024-01-01 00:00:00"), 3L, "x"),
          (2L, ts("2024-01-01 00:01:00"), 4L, "y"),
          (2L, ts("2024-01-01 00:02:00"), 5L, "z"),
          (1L, ts("2024-01-01 00:03:00"), 6L, "c"),
          (1L, ts("2024-01-01 00:04:00"), 7L, "d"),
          (1L, ts("2024-01-01 01:00:00"), 8L, "e"),
          (1L, ts("2024-01-01 01:01:00"), 9L, "f"))
          .toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "event_type", "ts", "event_id",
        gapSec = 300L, n = 3, k = 100)
      .as[(String, Long)].collect().toMap
    val streamed = sessions.filter(s => s._1 <= 2L)
      .flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    // drop the closer-event sessions (g/h) the batch frame lacks
    val expected = batchPaths
    assert(streamed.filter { case (p, _) => expected.contains(p) }
      == expected,
      s"stream grams $streamed vs batch $expected")
  }

  test("matchRecognizeStream == batch matchRecognize over the same " +
      "events, matches never span gaps or micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val out = StreamOps.matchRecognizeStream(in.toDS(),
      gapMs = 5 * 60 * 1000L, pattern = "a b+ c")
    val q = out.writeStream.format("memory").queryName("smatch")
      .outputMode("append").start()
    // user 1: a b (batch 1) then b c (batch 2) — one contiguous
    // a>b>b>c match that must survive the micro-batch boundary;
    // then a gap, then a c — NOT a match (b+ requires a b, and the
    // pre-gap events must not chain across)
    in.addData(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "b"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "a"),
      (2L, ts("2024-01-01 00:01:00"), 4L, "c"))
    processAll(q)
    in.addData(
      (1L, ts("2024-01-01 00:02:00"), 5L, "b"),
      (1L, ts("2024-01-01 00:03:00"), 6L, "c"))
    processAll(q)
    in.addData(
      (1L, ts("2024-01-01 01:00:00"), 7L, "a"),
      (1L, ts("2024-01-01 01:01:00"), 8L, "c"))
    processAll(q)
    // event-time jump closes everything
    in.addData((1L, ts("2024-01-01 09:00:00"), 9L, "z"),
      (2L, ts("2024-01-01 09:00:00"), 10L, "z"))
    processAll(q)
    in.addData((1L, ts("2024-01-01 18:00:00"), 11L, "z"),
      (2L, ts("2024-01-01 18:00:00"), 12L, "z"))
    processAll(q)
    q.stop()
    val got = spark.table("smatch")
      .select($"key", $"match_no", $"match_path", $"match_len")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got === Set((1L, 1L, "a>b>b>c", 4L)),
      s"stream matches wrong: $got")
    // batch operator over the same events agrees
    val batch = graft.operators.Journeys.matchRecognize(
        Seq(
          (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
          (1L, ts("2024-01-01 00:01:00"), 2L, "b"),
          (2L, ts("2024-01-01 00:00:00"), 3L, "a"),
          (2L, ts("2024-01-01 00:01:00"), 4L, "c"),
          (1L, ts("2024-01-01 00:02:00"), 5L, "b"),
          (1L, ts("2024-01-01 00:03:00"), 6L, "c"),
          (1L, ts("2024-01-01 01:00:00"), 7L, "a"),
          (1L, ts("2024-01-01 01:01:00"), 8L, "c"))
          .toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type", "a b+ c",
        gapSec = 300L)
      .select($"user_id", $"match_no", $"match_path", $"match_len")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(batch === got, s"batch $batch != stream $got")
  }
}
