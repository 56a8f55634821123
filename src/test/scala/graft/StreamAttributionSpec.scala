package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Attribution
import graft.streaming.StreamOps

/** Streaming attribution ([[StreamOps.attributionStream]]) must
  * equal the batch kernel ([[Attribution.credits]], q163) over the
  * same event log, across micro-batch boundaries: touches and
  * conversions split arbitrarily over triggers, a conversion's
  * credits emit exactly once (when the watermark finalizes it), and
  * a touch that arrives AFTER its conversion but before the
  * watermark passes still receives credit — the failure mode an
  * emit-on-arrival implementation would get wrong.
  */
class StreamAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val Lookback = 30L * 60 * 1000 // 30 min in ms

  // (user, ts, event_id, event_type, value)
  private val log = Seq(
    (1L, ts("2024-01-01 00:01:00"), 1L, "ad", 0.0),
    (1L, ts("2024-01-01 00:05:00"), 2L, "email", 0.0),
    (1L, ts("2024-01-01 00:07:00"), 6L, "ad", 0.0),
    (1L, ts("2024-01-01 00:10:00"), 3L, "purchase", 5.0),
    (1L, ts("2024-01-01 00:11:00"), 4L, "ad", 0.0), // after conv
    (2L, ts("2024-01-01 00:12:00"), 5L, "purchase", 7.5), // direct
    (3L, ts("2023-12-31 23:50:00"), 7L, "email", 0.0),
    (3L, ts("2024-01-01 00:25:00"), 8L, "purchase", 2.0))

  private def batchCredits = Attribution.credits(
      log.toDF("user_id", "ts", "event_id", "event_type", "value")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value")),
      "user_id", "event_id", "ts", "event_type", "value",
      convType = "purchase", touchTypes = Seq("ad", "email"),
      lookbackMicros = Lookback * 1000)
    .select(col("conv_id"), col("cents"), col("n_touches"),
      col("channel"), col("first_cents"), col("last_cents"),
      col("linear_millis"))
    .as[(Long, Long, Long, String, Long, Long, Long)]
    .collect().sorted.toSeq

  private def runStream(
      batches: Seq[Seq[(Long, Timestamp, Long, String, Double)]],
      name: String, watermarkDelay: String = "10 minutes")
      : Seq[(Long, Long, Long, String, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val out = StreamOps.attributionStream(in.toDS(),
      convType = "purchase", touchTypes = Seq("ad", "email"),
      lookbackMs = Lookback, watermarkDelay = watermarkDelay)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    // push the watermark far past every conversion, then one more
    // trigger so event-time timeouts fire on quiet keys
    in.addData((9L, ts("2024-01-01 02:00:00"), 99L, "noop", 0.0))
    q.processAllAvailable()
    in.addData((9L, ts("2024-01-01 02:30:00"), 100L, "noop", 0.0))
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select(col("conv_id"), col("cents"), col("n_touches"),
        col("channel"), col("first_cents"), col("last_cents"),
        col("linear_millis"))
      .as[(Long, Long, Long, String, Long, Long, Long)]
      .collect().sorted.toSeq
  }

  test("single-batch stream equals the batch kernel") {
    assert(runStream(Seq(log), "attr_one") === batchCredits)
  }

  test("credits are identical when the log splits across micro-batches, " +
      "including a touch arriving after its conversion") {
    // event 6 (a 00:07 touch) arrives in the batch AFTER conversion
    // 3 (00:10) is already in state — but still inside the allowed
    // 10-minute lateness, so the conversion (which only finalizes
    // once the watermark passes it) must wait and credit it
    val batches = Seq(
      Seq(log(0), log(6)),                    // early touches
      Seq(log(1), log(3), log(5)),            // conv 3 + conv 5
      Seq(log(2), log(4), log(7)))            // late-arriving touch 6
    assert(runStream(batches, "attr_split") === batchCredits)
  }

  test("restart from checkpoint recovers touches and pending conversions") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-attr-rs")
    val outDir = root.toString + "/out"
    val ckpt = root.toString + "/ckpt"
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    def start() = StreamOps.attributionStream(in.toDS(),
        convType = "purchase", touchTypes = Seq("ad", "email"),
        lookbackMs = Lookback, watermarkDelay = "10 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    // touch + conversion arrive, then the query DIES before the
    // watermark can finalize anything
    val q1 = start()
    in.addData((1L, ts("2024-01-01 00:01:00"), 1L, "ad", 0.0),
      (1L, ts("2024-01-01 00:10:00"), 2L, "purchase", 5.0))
    q1.processAllAvailable(); q1.stop()
    // restart: state (the buffered touch AND the pending conversion)
    // must come back from the state store, then finalize as usual
    val q2 = start()
    in.addData((9L, ts("2024-01-01 02:00:00"), 98L, "noop", 0.0))
    q2.processAllAvailable()
    in.addData((9L, ts("2024-01-01 02:30:00"), 99L, "noop", 0.0))
    q2.processAllAvailable(); q2.stop()
    val rows = spark.read.parquet(outDir)
      .select(col("conv_id"), col("channel"), col("first_cents"))
      .as[(Long, String, Long)].collect().toSeq
    assert(rows === Seq((2L, "ad", 500L)))
  }

  test("batch kernel sanity: the scenario exercises every credit shape") {
    val byConv = batchCredits.groupBy(_._1)
    // conv 3: three touches in window, touch 4 (after ct) excluded
    assert(byConv(3L).size === 3)
    assert(byConv(3L).map(_._4).toSet === Set("ad", "email"))
    assert(byConv(3L).map(_._7).sum === 3 * (500L * 1000 / 3))
    // conv 5: untouched -> (direct) with full value
    assert(byConv(5L) ===
      Seq((5L, 750L, 0L, "(direct)", 750L, 750L, 750000L)))
    // conv 8: user 3's only touch (23:50) sits five minutes OUTSIDE
    // the 30-min lookback (00:25 - 30min = 23:55) -> (direct); this
    // pins the exclusive window edge on a cross-midnight boundary
    assert(byConv(8L) === Seq((8L, 200L, 0L, "(direct)", 200L, 200L,
      200000L)))
  }
}
