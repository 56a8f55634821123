package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two dataset snapshots —
  * the monitoring pass a training-data pipeline runs when a new crawl
  * or feed lands: bin a numeric feature into a fixed histogram whose
  * edges come from the BASELINE snapshot, then score how far the
  * candidate snapshot's mass has moved.
  *
  * Divergences are deliberately ln-free: PSI/KL need `ln`, and libm
  * `ln` is not guaranteed correctly rounded across engines (the
  * [[BigramLm]]/[[Importance]] determinism contract). The two scores
  * here bracket the same signal:
  *
  *  - total variation contribution |p−q|/2 (L1 drift, bounded [0,1]),
  *  - chi-square contribution (q−p)²/p (the second-order Taylor term
  *    of KL(q‖p) — what PSI linearizes to for small shifts).
  *
  * Counts are Laplace-smoothed (+1 per bin) so empty bins cannot
  * divide by zero and a bin appearing only in the candidate still
  * scores finite drift.
  *
  * '''Determinism contract (integer ppb algebra).''' Every emitted
  * score column is a BIGINT in parts-per-billion, derived from the
  * exact integer counts by integer multiply/divide only — no double
  * ever reaches an output column. The r9 form hashed r6-snapped
  * doubles (`tv_c`/`chi_c`/`d`) plus `floor(p·1e6)` micro columns;
  * a double within 1 ulp of a rounding boundary flipped the floor on
  * one engine and not the other (CORRECTNESS_r09 q193/q200
  * hash-only misses). The recast keeps the whole chain in 64-bit
  * integers — `p_ppb = (n+1)·10⁹ div (total+bins)` — which both
  * this engine and any ANSI-SQL oracle compute bit-identically:
  *
  *  - `p_ppb`, `q_ppb` — smoothed bin shares, floor((n+1)·10⁹/(N+B))
  *  - `tv_ppb = |p_ppb − q_ppb| div 2` — TV contribution in ppb
  *  - `chi_ppb = (q_ppb − p_ppb)² div p_ppb` — chi² contribution in
  *    ppb (exactly (Δ·10⁻⁹)²/(p_ppb·10⁻⁹) = Δ²/p_ppb · 10⁻⁹)
  *  - `d_ppb = |cum_base·10⁹ div tb − cum_cur·10⁹ div tc|` (KS)
  *
  * Overflow/validity bounds (64-bit): the multiply-then-divide is
  * evaluated as `(a div b)·S + ((a mod b)·S) div b` ([[mulDivPpb]]),
  * exact while `b·10⁹` fits a long, i.e. totals up to ~9.2×10⁹ rows
  * per side — beyond that, pre-aggregate to per-shard histograms
  * (the counts, not the rows, are what drift needs) so `b` stays
  * bounded. `chi_ppb`'s denominator `p_ppb ≥ 1` holds while
  * `tb + bins ≤ 10⁹·(n_base+1)`, i.e. any baseline below a billion
  * rows — same pre-aggregation escape hatch above it.
  *
  * Scale shape: pass 1 computes the baseline min/max (one partial
  * aggregate → 1 row); pass 2 re-scans ONCE with the 1-row range
  * broadcast-joined, bins both sides with conditional counts, and
  * aggregates to `bins` rows. No shuffle carries more than `bins`
  * rows; both passes are plain column scans (at 100 TB the min/max
  * ride the parquet footer statistics and pass 1 is metadata-only).
  */
object Drift {

  /** Parts-per-billion scale shared by every drift score column and
    * the streaming twin. */
  val Ppb = 1000000000L

  /** floor(a·10⁹ / b) in pure 64-bit integer algebra, overflow-safe
    * decomposition: (a div b)·10⁹ + ((a mod b)·10⁹) div b. Exact for
    * any 0 ≤ a and 0 < b ≤ ~9.2×10⁹ (b·10⁹ must fit a long); a
    * itself is unbounded because only `a mod b < b` is scaled.
    * `a` and `b` are SQL expressions over named columns. */
  def mulDivPpb(a: String, b: String): Column =
    expr(
      s"(((($a) DIV ($b)) * $Ppb) + (((($a) % ($b)) * $Ppb) DIV ($b)))")

  /** DuckDB rendering of [[mulDivPpb]] for the oracle — same integer
    * identity, DuckDB's `//` integer division. */
  def mulDivPpbSql(a: String, b: String): String =
    s"(((($a) // ($b)) * $Ppb) + (((($a) % ($b)) * $Ppb) // ($b)))"

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

  /** Shared first half of both drift passes: tag, bin against the
    * baseline range, count per (bin, side), densify to all bin ids.
    * @return (bin, n_base, n_cur, tb, tc) — `bins` rows */
  private def binCounts(df: DataFrame, valueCol: Column,
      sideCol: Column, bins: Int): DataFrame = {
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
    * @return (bin, n_base, n_cur, p_ppb, q_ppb, tv_ppb, chi_ppb) —
    *         one row per bin 0..bins−1 (bins with no mass on either
    *         side still appear, smoothed); all BIGINT, per the
    *         integer-ppb determinism contract above */
  def histDrift(df: DataFrame, valueCol: Column, sideCol: Column,
      bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    binCounts(df, valueCol, sideCol, bins)
      .select(col("bin"), col("n_base"), col("n_cur"),
        mulDivPpb("n_base + 1", s"tb + $bins").as("p_ppb"),
        mulDivPpb("n_cur + 1", s"tc + $bins").as("q_ppb"))
      .select(col("bin"), col("n_base"), col("n_cur"),
        col("p_ppb"), col("q_ppb"),
        expr("abs(p_ppb - q_ppb) DIV 2").as("tv_ppb"),
        expr("((q_ppb - p_ppb) * (q_ppb - p_ppb)) DIV p_ppb")
          .as("chi_ppb"))
  }

  /** Kolmogorov-Smirnov drift over the same baseline-anchored bins:
    * per-bin CUMULATIVE shares of each side and their absolute
    * difference — the KS statistic is the max of `d_ppb` (the binned
    * KS, exact for the binned distributions; finer bins tighten it
    * toward the continuous statistic). Complements [[histDrift]]:
    * TV/chi-square weigh per-bin mass mismatch, KS catches a
    * LOCATION shift that per-bin smoothing dilutes.
    *
    * No smoothing here — cumulative counts are exact integers and
    * each side's share is one integer [[mulDivPpb]] per row.
    *
    * Scale shape: the same two scans as [[histDrift]]; the running
    * sums are a single-partition window over `bins` rows — bounded
    * by construction (bins is a constant, never data-sized), the
    * one place a one-partition window is the honest plan.
    *
    * @return (bin, n_base, n_cur, cum_base, cum_cur, d_ppb) — one
    *         row per bin, all BIGINT */
  def ksBins(df: DataFrame, valueCol: Column, sideCol: Column,
      bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    binCounts(df, valueCol, sideCol, bins)
      .select(col("bin"), col("n_base"), col("n_cur"),
        sum(col("n_base")).over(w).as("cum_base"),
        sum(col("n_cur")).over(w).as("cum_cur"),
        col("tb"), col("tc"))
      .select(col("bin"), col("n_base"), col("n_cur"),
        col("cum_base"), col("cum_cur"),
        abs(mulDivPpb("cum_base", "tb") -
          mulDivPpb("cum_cur", "tc")).as("d_ppb"))
  }

  /** EMBEDDING-space drift between two corpus snapshots: per label,
    * the squared L2 distance between the baseline and candidate
    * centroids — the monitor that catches "the new crawl's `en` text
    * embeds somewhere else" even when every scalar histogram (length,
    * quality, token stats — [[histDrift]]'s beat) stays flat.
    *
    * Exact-integer construction (the Drift determinism contract):
    * components snap to micro-ints (floor(x·1e6 + 0.5) — one IEEE
    * multiply both engines share), centroid comparison avoids the
    * division entirely via cross-multiplication:
    *
    *   ‖μA − μB‖² = Σ_j (sA_j·cB − sB_j·cA)² / (cA·cB)²
    *
    * — numerator summed in DECIMAL(38,0), ONE integral divide at the
    * end, result in pico units (micro²). Bound: |sA_j·cB − sB_j·cA|
    * ≤ 2·maxMicro·cA·cB, so the squared sum stays inside 38 digits
    * while maxMicro·cA·cB < ~1e18 — beyond that (1e12-row labels),
    * pre-divide per term (t div (cA·cB), two truncations) — the
    * documented trade, same as [[graft.operators.PageRank
    * .integerHits]]'s width note.
    *
    * Scale shape: one explode (map-side), one (label, dim) partial
    * aggregate, one label-sized rollup. Labels with an empty side
    * are dropped (no centroid to compare).
    *
    * @param inBaseline boolean column: true = baseline snapshot
    * @return (label, c_base, c_cand, drift_pico) */
  def embeddingCentroidDrift(vectors: DataFrame, labelCol: String,
      embCol: String, inBaseline: Column): DataFrame = {
    val m = vectors
      .select(col(labelCol).as("label"), inBaseline.as("a"),
        posexplode(col(embCol)))
      .select(col("label"), col("a"), col("pos").as("j"),
        floor(col("col").cast("double") * 1e6 + lit(0.5))
          .cast("long").as("v"))
    m.groupBy(col("label"), col("j"))
      .agg(
        sum(when(col("a"), col("v")).otherwise(0L)).as("sA"),
        sum(when(!col("a"), col("v")).otherwise(0L)).as("sB"),
        sum(when(col("a"), 1L).otherwise(0L)).as("cA"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("cB"))
      .filter(col("cA") > 0 && col("cB") > 0)
      .select(col("label"), col("cA"), col("cB"),
        (col("sA").cast("decimal(38,0)") * col("cB") -
          col("sB").cast("decimal(38,0)") * col("cA")).as("t"))
      .groupBy(col("label"), col("cA"), col("cB"))
      .agg(sum(expr("t * t")).as("num"))
      .select(col("label"),
        col("cA").as("c_base"), col("cB").as("c_cand"),
        expr("""num div ((CAST(cA AS DECIMAL(38,0)) * cB) *
                (CAST(cA AS DECIMAL(38,0)) * cB))""").as("drift_pico"))
  }
}
