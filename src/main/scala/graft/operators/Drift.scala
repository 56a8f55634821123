package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Distribution-drift measurement between two dataset snapshots —
  * the monitoring pass a training-data pipeline runs when a new crawl
  * or feed lands: bin a numeric feature into a fixed histogram whose
  * edges come from the BASELINE snapshot, then score how far the
  * candidate snapshot's mass has moved.
  *
  * Divergences are deliberately ln-free: PSI/KL need `ln`, and libm
  * `ln` is not guaranteed correctly rounded across engines (the
  * [[BigramLm]]/[[Importance]] determinism contract). The two scores
  * here bracket the same signal with only IEEE-exact ops
  * (+, −, ×, /, abs — all correctly rounded):
  *
  *  - total variation contribution |p−q|/2 (L1 drift, bounded [0,1]),
  *  - chi-square contribution (q−p)²/p (the second-order Taylor term
  *    of KL(q‖p) — what PSI linearizes to for small shifts).
  *
  * Counts are Laplace-smoothed (+1 per bin) so empty bins cannot
  * divide by zero and a bin appearing only in the candidate still
  * scores finite drift.
  *
  * Scale shape: pass 1 computes the baseline min/max (one partial
  * aggregate → 1 row); pass 2 re-scans ONCE with the 1-row range
  * broadcast-joined, bins both sides with conditional counts, and
  * aggregates to `bins` rows. No shuffle carries more than `bins`
  * rows; both passes are plain column scans (at 100 TB the min/max
  * ride the parquet footer statistics and pass 1 is metadata-only).
  */
object Drift {

  /** The shared bin assignment both the batch pass and the streaming
    * twin use: `bins` equi-width cells over [lo, hi], out-of-range
    * values clamped into the edge cells, a zero-width range
    * collapsing to bin 0. Exact same op sequence in both engines
    * (one subtract, one divide by the precomputed width, floor,
    * clamp). */
  def binOf(v: Column, lo: Column, hi: Column, bins: Int): Column =
    when(hi === lo, lit(0L)).otherwise(
      least(lit(bins.toLong - 1), greatest(lit(0L),
        floor((v - lo) / ((hi - lo) / lit(bins.toDouble))))))

  /** Materialized baseline histogram — the broadcast-sized artifact
    * a monitoring deployment computes ONCE per reference snapshot
    * and scores every incoming window against ([[
    * graft.streaming.StreamOps.driftStream]]). Collects 1+`bins`
    * rows to the driver (the [[Pq]] plan-time-codebook contract:
    * bounded by construction, never data-sized).
    *
    * @return (lo, hi, per-bin counts of length `bins`) */
  def baselineOf(df: DataFrame, valueCol: Column,
      bins: Int): (Double, Double, Seq[Long]) = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val v = df.select(valueCol.cast("double").as("v"))
    val r = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val counts = v
      .select(binOf(col("v"), lit(lo), lit(hi), bins).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    (lo, hi, (0L until bins.toLong).map(counts.getOrElse(_, 0L)))
  }

  /** Per-bin drift rows between the `sideCol`=true (baseline) and
    * `sideCol`=false (candidate) partitions of `df`.
    *
    * Bin edges are `bins` equi-width cells over the baseline's
    * [min, max]; candidate values outside the baseline range clamp
    * into the first/last cell (the "new mass out of range" signal
    * lands in the edge bins rather than being dropped). A
    * zero-width baseline (constant column) puts everything in bin 0.
    *
    * @return (bin, n_base, n_cur, p_micro, q_micro, tv_c, chi_c) —
    *         one row per bin 0..bins−1 (bins with no mass on either
    *         side still appear, smoothed); p/q are the smoothed bin
    *         shares and the contributions are [[Q.r6]]-snapped so a
    *         downstream exact decimal SUM is engine-stable */
  def histDrift(df: DataFrame, valueCol: Column, sideCol: Column,
      bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = df.sparkSession
    val tagged = df.select(valueCol.cast("double").as("v"),
      sideCol.cast("boolean").as("is_base"))
    val range = tagged.filter(col("is_base"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val binned = tagged.crossJoin(broadcast(range))
      .select(binOf(col("v"), col("lo"), col("hi"), bins).as("bin"),
        col("is_base"))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
        sum(when(!col("is_base"), 1L).otherwise(0L)).as("n_cur"))
    // every bin id must appear even with zero mass on both sides —
    // the smoothed share is still defined and contributes drift
    import spark.implicits._
    val allBins = (0L until bins.toLong).toDF("bin")
    val totals = binned.agg(
      sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    allBins
      .join(broadcast(binned), Seq("bin"), "left_outer")
      .na.fill(0L, Seq("n_base", "n_cur"))
      .crossJoin(broadcast(totals))
      .select(col("bin"), col("n_base"), col("n_cur"),
        ((col("n_base") + lit(1L)).cast("double") /
          (col("tb") + lit(bins.toLong)).cast("double")).as("p"),
        ((col("n_cur") + lit(1L)).cast("double") /
          (col("tc") + lit(bins.toLong)).cast("double")).as("q"))
      .select(col("bin"), col("n_base"), col("n_cur"),
        floor(col("p") * lit(1e6)).cast("long").as("p_micro"),
        floor(col("q") * lit(1e6)).cast("long").as("q_micro"),
        Q.r6(abs(col("p") - col("q")) / lit(2.0)).as("tv_c"),
        Q.r6((col("q") - col("p")) * (col("q") - col("p")) / col("p"))
          .as("chi_c"))
  }

  /** Kolmogorov-Smirnov drift over the same baseline-anchored bins:
    * per-bin CUMULATIVE shares of each side and their absolute
    * difference — the KS statistic is the max of `d` (the binned KS,
    * exact for the binned distributions; finer bins tighten it
    * toward the continuous statistic). Complements [[histDrift]]:
    * TV/chi-square weigh per-bin mass mismatch, KS catches a
    * LOCATION shift that per-bin smoothing dilutes.
    *
    * No smoothing here — cumulative counts are exact integers and
    * the two divisions per row are IEEE-exact, [[Q.r6]]-snapped.
    *
    * Scale shape: the same two scans as [[histDrift]]; the running
    * sums are a single-partition window over `bins` rows — bounded
    * by construction (bins is a constant, never data-sized), the
    * one place a one-partition window is the honest plan.
    *
    * @return (bin, n_base, n_cur, cum_base, cum_cur, d) — one row
    *         per bin, `d` r6-snapped */
  def ksBins(df: DataFrame, valueCol: Column, sideCol: Column,
      bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = df.sparkSession
    val tagged = df.select(valueCol.cast("double").as("v"),
      sideCol.cast("boolean").as("is_base"))
    val range = tagged.filter(col("is_base"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val binned = tagged.crossJoin(broadcast(range))
      .select(binOf(col("v"), col("lo"), col("hi"), bins).as("bin"),
        col("is_base"))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
        sum(when(!col("is_base"), 1L).otherwise(0L)).as("n_cur"))
    import spark.implicits._
    val allBins = (0L until bins.toLong).toDF("bin")
    val totals = binned.agg(
      sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    allBins
      .join(broadcast(binned), Seq("bin"), "left_outer")
      .na.fill(0L, Seq("n_base", "n_cur"))
      .crossJoin(broadcast(totals))
      .select(col("bin"), col("n_base"), col("n_cur"),
        sum(col("n_base")).over(w).as("cum_base"),
        sum(col("n_cur")).over(w).as("cum_cur"),
        col("tb"), col("tc"))
      .select(col("bin"), col("n_base"), col("n_cur"),
        col("cum_base"), col("cum_cur"),
        Q.r6(abs(col("cum_base").cast("double") /
            col("tb").cast("double") -
          col("cum_cur").cast("double") / col("tc").cast("double")))
          .as("d"))
  }
}
