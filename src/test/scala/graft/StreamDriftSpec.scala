package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Drift
import graft.streaming.StreamOps

/** Streaming drift twin contract: for every CLOSED window,
  * [[StreamOps.driftStream]] against `baselineOf(base)` emits
  * row-for-row what the batch [[Drift.histDrift]] computes over
  * (base, that window's events) — across micro-batch splits, under
  * out-of-order arrival, and with late-but-allowed events counted.
  */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  private val baseVals = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 10.0)
  private val Bins = 4

  test("baselineOf pins the histogram artifact") {
    val (lo, hi, counts) =
      Drift.baselineOf(baseVals.toDF("v"), col("v"), Bins)
    assert((lo, hi) === (0.0, 10.0))
    assert(counts === Seq(3L, 2L, 0L, 1L))
  }

  test("closed windows equal the batch drift, across splits and " +
      "with a late-but-allowed event") {
    implicit val sqlCtx = spark.sqlContext
    val (lo, hi, counts) =
      Drift.baselineOf(baseVals.toDF("v"), col("v"), Bins)
    val in = MemoryStream[(Timestamp, Double)]
    val q = StreamOps.driftStream(in.toDF().toDF("ts", "v"),
        "ts", "v", windowLen = "10 minutes", watermark = "5 minutes",
        lo, hi, counts)
      .writeStream.format("memory").queryName("drift")
      .outputMode("append").start()
    // window [0,10): out-of-order within and across batches; one
    // value below and one above the baseline range (clamps)
    in.addData((ts(4), 9.0), (ts(1), 1.0))
    q.processAllAvailable()
    // late-but-allowed: watermark still at 4−5 < 0, so t=7 and a
    // second window's events land together
    in.addData((ts(7), -5.0), (ts(12), 2.0), (ts(15), 100.0))
    q.processAllAvailable()
    // advance the watermark far past both windows to close them
    in.addData((ts(45), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("drift")
      .select(col("window_start"), col("bin"), col("n_base"),
        col("n_cur"), col("p_ppb"), col("q_ppb"), col("tv_ppb"),
        col("chi_ppb"))
      .as[(Timestamp, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toList
    // exactly the two closed windows, bins rows each; [40,50) open
    assert(got.map(_._1).distinct.toSet === Set(ts(0), ts(10)))
    assert(got.size === 2 * Bins)
    def batch(winVals: Seq[Double]) =
      Drift.histDrift(
          (baseVals.map((_, true)) ++ winVals.map((_, false)))
            .toDF("v", "is_base"),
          col("v"), col("is_base"), Bins)
        .orderBy("bin")
        .select(col("bin"), col("n_base"), col("n_cur"),
          col("p_ppb"), col("q_ppb"), col("tv_ppb"), col("chi_ppb"))
        .as[(Long, Long, Long, Long, Long, Long, Long)]
        .collect().toList
    assert(got.filter(_._1 == ts(0)).sortBy(_._2)
      .map(t => (t._2, t._3, t._4, t._5, t._6, t._7, t._8)) ===
      batch(Seq(9.0, 1.0, -5.0)))
    assert(got.filter(_._1 == ts(10)).sortBy(_._2)
      .map(t => (t._2, t._3, t._4, t._5, t._6, t._7, t._8)) ===
      batch(Seq(2.0, 100.0)))
  }

  test("KS twin: closed windows equal batch ksBins, across splits " +
      "and out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val (lo, hi, counts) =
      Drift.baselineOf(baseVals.toDF("v"), col("v"), Bins)
    val in = MemoryStream[(Timestamp, Double)]
    val q = StreamOps.ksDriftStream(in.toDF().toDF("ts", "v"),
        "ts", "v", windowLen = "10 minutes", watermark = "5 minutes",
        lo, hi, counts)
      .writeStream.format("memory").queryName("ksdrift")
      .outputMode("append").start()
    in.addData((ts(4), 9.0), (ts(1), 1.0))
    q.processAllAvailable()
    in.addData((ts(7), -5.0), (ts(12), 2.0), (ts(15), 100.0))
    q.processAllAvailable()
    in.addData((ts(45), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ksdrift")
      .select(col("window_start"), col("bin"), col("n_base"),
        col("n_cur"), col("cum_base"), col("cum_cur"), col("d_ppb"))
      .as[(Timestamp, Long, Long, Long, Long, Long, Long)]
      .collect().toList
    assert(got.map(_._1).distinct.toSet === Set(ts(0), ts(10)))
    assert(got.size === 2 * Bins)
    def batchKs(winVals: Seq[Double]) =
      Drift.ksBins(
          (baseVals.map((_, true)) ++ winVals.map((_, false)))
            .toDF("v", "is_base"),
          col("v"), col("is_base"), Bins)
        .orderBy("bin")
        .select(col("bin"), col("n_base"), col("n_cur"),
          col("cum_base"), col("cum_cur"), col("d_ppb"))
        .as[(Long, Long, Long, Long, Long, Long)]
        .collect().toList
    assert(got.filter(_._1 == ts(0)).sortBy(_._2)
      .map(t => (t._2, t._3, t._4, t._5, t._6, t._7)) ===
      batchKs(Seq(9.0, 1.0, -5.0)))
    assert(got.filter(_._1 == ts(10)).sortBy(_._2)
      .map(t => (t._2, t._3, t._4, t._5, t._6, t._7)) ===
      batchKs(Seq(2.0, 100.0)))
  }

  test("embedding twin: closed windows equal the batch centroid " +
      "drift against the same baseline, across splits") {
    implicit val sqlCtx = spark.sqlContext
    val baseline = Seq(
      (0, Array(1f, 0f)), (0, Array(0f, 0f)),  // label 0: μ=(.5, 0)
      (1, Array(0.25f, 0.25f)))                // label 1
      .toDF("label", "emb")
    val in = MemoryStream[(Timestamp, Int, Array[Float])]
    val q = StreamOps.embeddingDriftStream(
        in.toDF().toDF("ts", "label", "emb"),
        "ts", "label", "emb", dim = 2,
        windowLen = "10 minutes", watermark = "5 minutes",
        baseline = baseline)
      .writeStream.format("memory").queryName("edrift")
      .outputMode("append").start()
    // window [0,10): label 0 arrives split across two micro-batches
    in.addData((ts(1), 0, Array(0.5f, 1f)))
    q.processAllAvailable()
    in.addData((ts(4), 0, Array(0.5f, 0f)),
      (ts(3), 1, Array(0.25f, 0.75f)),
      // second window, closes the first via the watermark
      (ts(12), 0, Array(9f, 9f)))
    q.processAllAvailable()
    in.addData((ts(30), 0, Array(0f, 0f)), (ts(45), 0, Array(0f, 0f)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("edrift")
      .select($"window_start", $"label", $"c_base", $"c_cand",
        $"drift_pico")
      .as[(Timestamp, Int, Long, Long, Long)].collect().toSet
    // batch replay: same baseline + the window's vectors
    def batch(label: Int, win: Seq[Array[Float]]): (Long, Long, Long) = {
      val baseRows = Seq(
        (0L, 0, Array(1f, 0f)), (2L, 0, Array(0f, 0f)),
        (4L, 1, Array(0.25f, 0.25f)))
      val candRows = win.zipWithIndex.map { case (v, i) =>
        ((i * 2 + 1).toLong, label, v) }
      val r = Drift.embeddingCentroidDrift(
          (baseRows ++ candRows).toDF("vec_id", "label", "emb"),
          "label", "emb", inBaseline = col("vec_id") % 2 === 0)
        .filter(col("label") === label)
        .as[(Int, Long, Long, Long)].collect().head
      (r._2, r._3, r._4)
    }
    val w0l0 = batch(0, Seq(Array(0.5f, 1f), Array(0.5f, 0f)))
    val w0l1 = batch(1, Seq(Array(0.25f, 0.75f)))
    val w1l0 = batch(0, Seq(Array(9f, 9f)))
    assert(got.contains((ts(0), 0, w0l0._1, w0l0._2, w0l0._3)),
      s"window0/label0: $got")
    assert(got.contains((ts(0), 1, w0l1._1, w0l1._2, w0l1._3)),
      s"window0/label1: $got")
    assert(got.contains((ts(10), 0, w1l0._1, w1l0._2, w1l0._3)),
      s"window1/label0: $got")
    // hand check: window0/label0 centroid (0.5, 0.5) vs baseline
    // (0.5, 0) -> ||d||^2 = 0.25 -> 2.5e11 pico
    assert(w0l0 === ((2L, 2L, 250000000000L)))
  }

  test("calibration twin: closed windows equal the batch " +
      "reliability bins, across splits and out-of-order") {
    import graft.operators.Evals
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Boolean)]
    val q = StreamOps.calibrationStream(
        in.toDF().toDF("ts", "conf", "hit"),
        "ts", "conf", "hit", windowLen = "10 minutes",
        watermark = "5 minutes", bins = 10)
      .writeStream.format("memory").queryName("calib")
      .outputMode("append").start()
    // window [0,10): bins 1, 3, 9 populated; split across batches,
    // out-of-order inside each
    in.addData((ts(4), 950000L, true), (ts(1), 100000L, false))
    q.processAllAvailable()
    // a late-but-allowed event for window 0 plus window 1 rows
    in.addData((ts(7), 300000L, true), (ts(12), 500000L, false),
      (ts(15), 900000L, true))
    q.processAllAvailable()
    in.addData((ts(45), 0L, false)) // close both windows
    q.processAllAvailable()
    q.stop()
    val got = spark.table("calib")
      .select($"window_start", $"bin", $"n", $"sum_conf_ppm",
        $"pos", $"gap", $"ece_ppm")
      .as[(Timestamp, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    def batch(rows: Seq[(Long, Boolean)], w: Timestamp) =
      Evals.calibrationBins(rows.toDF("conf", "hit"), col("conf"),
          col("hit"), 10)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map { case (b, n, s, p, g, e) => (w, b, n, s, p, g, e) }
        .toSet
    val want =
      batch(Seq((950000L, true), (100000L, false), (300000L, true)),
        ts(0)) ++
      batch(Seq((500000L, false), (900000L, true)), ts(10))
    assert(got.filterNot(_._1 == ts(40)) === want)
  }

  test("AUC twin: closed windows equal batch exactAuc on the binned " +
      "scores; one-class windows dropped") {
    import graft.operators.Evals
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Boolean)]
    val q = StreamOps.aucStream(in.toDF().toDF("ts", "bin", "hit"),
        "ts", "bin", "hit", windowLen = "10 minutes",
        watermark = "5 minutes", bins = 4)
      .writeStream.format("memory").queryName("aucmon")
      .outputMode("append").start()
    // window 0: mixed classes with a tie bin, split across batches
    in.addData((ts(1), 3L, true), (ts(4), 1L, false))
    q.processAllAvailable()
    // window 0 late-allowed tie row; window 1 all-positive (dropped)
    in.addData((ts(7), 1L, true), (ts(12), 2L, true),
      (ts(15), 3L, true))
    q.processAllAvailable()
    in.addData((ts(45), 0L, false))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("aucmon")
      .select($"window_start", $"n_pos", $"n_neg", $"two_u",
        $"auc_ppm")
      .as[(Timestamp, Long, Long, Long, Long)].collect()
      .filterNot(_._1 == ts(40)).toList
    val b = Evals.exactAuc(
        Seq((3L, true), (1L, false), (1L, true)).toDF("c", "y"),
        col("c"), col("y"))
      .as[(Long, Long, Long, Long)].collect().head
    // window 1 (all positives) must not emit at all
    assert(got === List((ts(0), b._1, b._2, b._3, b._4)))
  }
}
