package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Stream-stream interval join + checkpoint recovery (G12). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream interval join matches within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val signups = MemoryStream[(Long, Timestamp)]
    val out = StreamOps.intervalJoin(
      purchases.toDF().toDF("user_id", "ts", "amount"),
      signups.toDF().toDF("user_id", "ts"),
      key = "user_id", tsCol = "ts", watermark = "10 minutes",
      window = "1 hour")
      .select($"l.user_id", $"amount", $"r.ts".as("signup_ts"))
    val q = out.writeStream.format("memory").queryName("sjoin")
      .outputMode("append").start()

    signups.addData((1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:00:00")))
    purchases.addData(
      (1L, ts("2024-01-01 00:30:00"), 10.0), // within 1h of signup
      (2L, ts("2024-01-01 02:00:00"), 20.0), // outside window
      (3L, ts("2024-01-01 00:30:00"), 30.0)) // no signup
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sjoin")
      .select($"user_id", $"amount").as[(Long, Double)].collect().toSet
    assert(rows == Set((1L, 10.0)))
  }

  test("left-outer interval join null-pads the unmatched side after watermark expiry, evicting state") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val signups = MemoryStream[(Long, Timestamp)]
    val out = StreamOps.intervalJoin(
      purchases.toDF().toDF("user_id", "ts", "amount"),
      signups.toDF().toDF("user_id", "ts"),
      key = "user_id", tsCol = "ts", watermark = "10 minutes",
      window = "1 hour", joinType = "left_outer")
      .select($"l.user_id", $"amount", $"r.ts".as("signup_ts"))
    val q = out.writeStream.format("memory").queryName("sjoin_outer")
      .outputMode("append").start()

    signups.addData((1L, ts("2024-01-01 00:00:00")))
    purchases.addData(
      (1L, ts("2024-01-01 00:30:00"), 10.0), // matches signup
      (3L, ts("2024-01-01 00:30:00"), 30.0)) // no signup ever
    q.processAllAvailable()
    // the unmatched row must NOT emit while a match could still
    // arrive (watermark hasn't passed its interval yet)
    val early = spark.table("sjoin_outer")
      .select($"user_id").as[Long].collect().toSet
    assert(!early.contains(3L),
      "outer row emitted before the watermark proved no match")

    // advance BOTH watermarks far past 00:30+1h+10min; the global
    // watermark is their min, so each side needs late data
    purchases.addData((9L, ts("2024-01-01 09:00:00"), 0.0))
    signups.addData((9L, ts("2024-01-01 09:00:00")))
    q.processAllAvailable()
    // one more batch: eviction happens when a batch runs AFTER the
    // watermark update from the previous one
    purchases.addData((9L, ts("2024-01-01 10:00:00"), 0.0))
    signups.addData((9L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()

    val rows = spark.table("sjoin_outer")
      .select($"user_id", $"amount", $"signup_ts")
      .as[(Long, Double, Option[Timestamp])].collect()
    val byUser = rows.groupBy(_._1)
    assert(byUser(1L).head._3.isDefined, "matched row lost its right side")
    assert(byUser(3L).head == ((3L, 30.0, None)),
      s"unmatched row not null-padded: ${byUser.get(3L)}")

    // state TTL: the expired interval's rows were REMOVED from the
    // join state store, not retained forever (eviction lands in
    // whichever micro-batch follows the watermark bump, so scan the
    // whole progress history, not just lastProgress)
    val sop = q.recentProgress.flatMap(_.stateOperators)
    assert(sop.nonEmpty, "no stateful operator progress reported")
    val removed = sop.map(_.numRowsRemoved).sum
    assert(removed > 0L,
      s"watermark advanced past every buffered row but none were evicted: " +
        sop.map(s => s"total=${s.numRowsTotal} removed=${s.numRowsRemoved}")
          .mkString(", "))
    q.stop()
  }

  test("query restarts from checkpoint and keeps aggregation state") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val outDir = Files.createTempDirectory("graft-ckpt-out").toString
    val in = MemoryStream[(Timestamp, Long)]
    // parquet sink (memory sink can't recover from a checkpoint);
    // append mode emits a window once the watermark finalizes it
    def startQuery() =
      StreamOps.tumblingAgg(
          in.toDF().toDF("ts", "key").withColumn("value", lit(1.0)),
          "ts", "key", "10 minutes", "5 minutes")
        .select($"window.start".as("w_start"), $"key", $"n")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

    val q1 = startQuery()
    in.addData((ts("2024-01-01 00:01:00"), 1L))
    q1.processAllAvailable()
    q1.stop()

    // second incarnation, same checkpoint: state must carry over
    val q2 = startQuery()
    in.addData((ts("2024-01-01 00:02:00"), 1L))
    q2.processAllAvailable()
    // advance watermark far past the 00:00 window to finalize it
    in.addData((ts("2024-01-01 06:00:00"), 9L))
    q2.processAllAvailable()
    in.addData((ts("2024-01-01 07:00:00"), 9L))
    q2.processAllAvailable()
    q2.stop()

    val n = spark.read.parquet(outDir)
      .filter($"key" === 1L).agg(max($"n")).as[Long].head()
    assert(n == 2L) // both incarnations' events in the same window
  }
}
