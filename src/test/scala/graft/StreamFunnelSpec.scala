package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Journeys
import graft.streaming.StreamOps

/** Streaming funnel ([[StreamOps.funnelStream]]) must equal the
  * batch kernel ([[Journeys.funnelTimes]], q139) over the same
  * event log, across micro-batch boundaries — including the hard
  * case: a first-step event arriving LATE (inside the allowed
  * lateness) that moves the anchor earlier, which can both extend a
  * funnel (a click before the old anchor becomes reachable) and
  * break one (later steps fall outside the shifted window). Both
  * directions are exercised.
  */
class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val Steps = Seq("signup", "click", "purchase")
  private val WindowSec = 180L // 3 minutes per step

  // (user, ts, event_type)
  private val log = Seq(
    // user 1: clean funnel off the 00:10 anchor — until a LATE
    // signup at 00:05 moves the anchor and breaks stages 2-3
    // (00:05 + 3min = 00:08 < 00:11)
    (1L, ts("2024-01-01 00:10:00"), "signup"),
    (1L, ts("2024-01-01 00:11:00"), "click"),
    (1L, ts("2024-01-01 00:12:00"), "purchase"),
    (1L, ts("2024-01-01 00:05:00"), "signup"),
    // user 2: the click PRECEDES the first-seen anchor (00:10) but
    // follows the late-arriving true anchor (00:05) — the pruning
    // hazard: an emit-eager or over-pruning implementation loses it
    (2L, ts("2024-01-01 00:10:00"), "signup"),
    (2L, ts("2024-01-01 00:06:00"), "click"),
    (2L, ts("2024-01-01 00:05:00"), "signup"),
    // user 3: full funnel spread one event per micro-batch
    (3L, ts("2024-01-01 00:00:00"), "signup"),
    (3L, ts("2024-01-01 00:02:00"), "click"),
    (3L, ts("2024-01-01 00:04:00"), "purchase"),
    // user 4: no anchor -> no rows at all
    (4L, ts("2024-01-01 00:03:00"), "click"),
    (4L, ts("2024-01-01 00:04:30"), "purchase"))

  private def batchStages: Set[(Long, Long, Long)] =
    Journeys.funnelTimes(
        log.toDF("user_id", "ts", "event_type"),
        "user_id", "event_type", "ts", Steps, WindowSec)
      .select(col("user_id"), col("stage"),
        unix_millis(col("t")).as("t"))
      .as[(Long, Long, Long)].collect().toSet

  private def runStream(
      batches: Seq[Seq[(Long, Timestamp, String)]],
      name: String): Set[(Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.funnelStream(in.toDS(), Steps, WindowSec,
      watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    // push the watermark past every funnel horizon, then one more
    // trigger so event-time timeouts fire on quiet keys
    in.addData((9L, ts("2024-01-01 02:00:00"), "noop"))
    q.processAllAvailable()
    in.addData((9L, ts("2024-01-01 02:30:00"), "noop"))
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select(col("user"), col("stage"), unix_millis(col("t")).as("t"))
      .as[(Long, Long, Long)].collect().toSet
  }

  test("single-batch stream equals the batch kernel") {
    assert(runStream(Seq(log), "funnel_one") === batchStages)
  }

  test("stage rows are identical when the log splits across micro-batches, " +
      "with late anchors moving both ways") {
    val batches = Seq(
      Seq(log(0), log(4), log(5), log(7)),   // first-seen anchors
      Seq(log(1), log(2), log(8), log(10)),  // progress + noise
      Seq(log(3), log(6), log(9), log(11)))  // LATE anchors arrive
    assert(runStream(batches, "funnel_split") === batchStages)
  }

  test("restart from checkpoint recovers a mid-flight funnel") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-fnl-rs")
    val outDir = root.toString + "/out"
    val ckpt = root.toString + "/ckpt"
    val in = MemoryStream[(Long, Timestamp, String)]
    def start() = StreamOps.funnelStream(in.toDS(), Steps, WindowSec,
        watermarkDelay = "10 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    // anchor + stage 2 arrive, then the query dies pre-finalization
    val q1 = start()
    in.addData((1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 00:02:00"), "click"))
    q1.processAllAvailable(); q1.stop()
    // stage 3 and the watermark push arrive after the restart — the
    // recovered state must complete the three-stage funnel
    val q2 = start()
    in.addData((1L, ts("2024-01-01 00:04:00"), "purchase"))
    q2.processAllAvailable()
    in.addData((9L, ts("2024-01-01 02:00:00"), "noop"))
    q2.processAllAvailable()
    in.addData((9L, ts("2024-01-01 02:30:00"), "noop"))
    q2.processAllAvailable(); q2.stop()
    val rows = spark.read.parquet(outDir)
      .select(col("user"), col("stage"))
      .as[(Long, Long)].collect().toSet
    assert(rows === Set((1L, 1L), (1L, 2L), (1L, 3L)))
  }

  test("batch kernel sanity: the scenario exercises anchor movement " +
      "in both directions") {
    val byUser = batchStages.groupBy(_._1)
    // user 1: the late 00:05 anchor breaks stages 2-3
    assert(byUser(1L) ===
      Set((1L, 1L, ts("2024-01-01 00:05:00").getTime)))
    // user 2: the late anchor RESCUES the pre-anchor click
    assert(byUser(2L) ===
      Set((2L, 1L, ts("2024-01-01 00:05:00").getTime),
        (2L, 2L, ts("2024-01-01 00:06:00").getTime)))
    // user 3: full three-stage funnel
    assert(byUser(3L).map(_._2) === Set(1L, 2L, 3L))
    // user 4: never anchored
    assert(!byUser.contains(4L))
  }
}
