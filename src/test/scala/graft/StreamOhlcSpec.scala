package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming OHLC twin of q169: candles emitted on window close must
  * equal the batch aggregate over the same events, including the
  * event-time-ordered open/close under out-of-order arrival.
  */
class StreamOhlcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("closed candles equal the batch answer under out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long, Long)]
    val df = in.toDF().toDF("ts", "sym", "id", "v")
    val q = StreamOps.ohlcStream(df, "ts", "sym", "id", "v",
        windowLen = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("ohlc")
      .outputMode("append").start()
    // window [0,10): out-of-order within the window — open must be
    // the EARLIEST by event time (id 3 at t=1), close the latest
    in.addData((ts(4), "a", 1L, 50L), (ts(1), "a", 3L, 10L),
      (ts(9), "a", 2L, 30L), (ts(2), "b", 4L, 7L))
    q.processAllAvailable()
    // advance the watermark far past the first window to close it
    in.addData((ts(30), "a", 9L, 99L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ohlc")
      .select(col("sym"), col("open"), col("high"), col("low"),
        col("close"), col("n_trades"), col("sum_value"))
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.sorted
    assert(rows === Seq(
      ("a", 10L, 50L, 10L, 30L, 3L, 90L),
      ("b", 7L, 7L, 7L, 7L, 1L, 7L)))
  }
}
