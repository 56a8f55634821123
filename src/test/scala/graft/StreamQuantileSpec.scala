package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch
import graft.streaming.StreamOps

/** Streaming quantile-sketch twin contract ([[StreamOps
  * .quantileStream]]): per closed window, `n` is exact and the
  * estimates obey the q202 sketch contract — EXACT while the window
  * fits one level-0 buffer (n ≤ k: no compaction, any merge order
  * folds the same raw values), and within the deterministic rank
  * band beyond that, across micro-batch splits and out-of-order
  * arrival.
  */
class StreamQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  /** Reference estimate: the sketch's own rank rule over exact
    * values (rank = max(1, round(q·n)) over the sorted window). */
  private def exactAt(vals: Seq[Double], q: Double): Double = {
    val s = vals.sorted
    s((math.max(1L, math.round(q * s.size)) - 1).toInt)
  }

  private def run(batches: Seq[Seq[(Timestamp, Double)]], k: Int,
      qs: Seq[Double], name: String): Map[Timestamp, (Long, Seq[Double])] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val q = StreamOps.quantileStream(in.toDF().toDF("ts", "v"),
        "ts", "v", windowLen = "10 minutes", watermark = "5 minutes",
        k = k, qs = qs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    // close every window
    in.addData((ts(500), 0.0)); q.processAllAvailable()
    q.stop()
    spark.table(name)
      .as[(Timestamp, Long, Seq[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("small windows (n <= k): estimates are exact, n is exact, " +
      "out-of-order and split across batches") {
    val w0 = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val w1 = Seq(100.0, 50.0)
    val got = run(Seq(
      Seq((ts(4), w0(0)), (ts(1), w0(1))),
      Seq((ts(7), w0(2)), (ts(2), w0(3)), (ts(12), w1(0))),
      Seq((ts(8), w0(4)), (ts(15), w1(1)))),
      k = 64, qs = Seq(0.5, 0.9), name = "ql_small")
    assert(got.keySet === Set(ts(0), ts(10)))
    assert(got(ts(0)) === ((5L,
      Seq(exactAt(w0, 0.5), exactAt(w0, 0.9)))))
    assert(got(ts(10)) === ((2L,
      Seq(exactAt(w1, 0.5), exactAt(w1, 0.9)))))
  }

  test("compacted windows (n >> k): estimates stay inside the " +
      "deterministic rank band") {
    val n = 400
    val vals = (1 to n).map(i => ((i * 7919) % n).toDouble)
    val k = 8
    val got = run(
      vals.grouped(90).map(g =>
        g.map(v => (ts(v.toInt % 10), v)): Seq[(Timestamp, Double)]).toSeq,
      k = k, qs = Seq(0.5, 0.9), name = "ql_big")
    val (cnt, est) = got(ts(0))
    assert(cnt === n.toLong)
    // L·n/2k with L = ceil(log2(n/k)) levels, doubled for slack
    val L = math.ceil(math.log(n.toDouble / k) / math.log(2)).toInt
    val band = 2 * L * n / (2 * k)
    val sorted = vals.sorted
    Seq(0.5, 0.9).zipWithIndex.foreach { case (q, i) =>
      val target = math.max(1L, math.round(q * n)).toInt
      val lo = sorted(math.max(0, target - 1 - band))
      val hi = sorted(math.min(n - 1, target - 1 + band))
      assert(est(i) >= lo && est(i) <= hi,
        s"q=$q est=${est(i)} not in [$lo, $hi]")
    }
  }

  test("streamed sketch matches the batch sketch on identical " +
      "single-partition input (n <= k exactness corollary)") {
    val vals = Seq(3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.3)
    val batchEst = QuantileSketch.estimate(
      vals.foldLeft(QuantileSketch.emptyBuf(64))(
        (b, v) => QuantileSketch.insert(b, v, 64)) match {
        case b => QuantileSketch.toState(b)
      }, Seq(0.25, 0.75))
    val got = run(Seq(vals.map(v => (ts(3), v))), k = 64,
      qs = Seq(0.25, 0.75), name = "ql_batch_eq")
    assert(got(ts(0)) === ((vals.size.toLong, batchEst)))
  }
}
