package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation and preference analytics — the operators a
  * training-data platform needs once models start coming OUT of the
  * data going in: Bradley-Terry strengths from pairwise preference
  * logs (the RLHF reward-data shape), exact ROC-AUC from a score
  * histogram, calibration bins + expected calibration error, and
  * Cohen's kappa for inter-annotator agreement (label-quality
  * auditing of human preference/label collection).
  *
  * Everything runs in exact integer algebra (micro = 1e-6, ppm
  * units): sums widen to DECIMAL(38,0) (DuckDB's HUGEINT SUM width,
  * the q204 lesson — int64 wraps silently, decimal degrades to a
  * loud NULL), divisions are integral `div` on positive operands
  * (where a value can be negative — kappa — the sign is split out
  * explicitly, because Spark `div` truncates toward zero while a
  * floor-division engine would round down). No float ever reaches a
  * hashed column.
  */
object Evals {

  private def wide(c: Column): Column = c.cast("decimal(38,0)")

  /** Canonical oriented pair-count frame from a raw comparison log:
    * one row per ordered (item, opp) with `n` comparisons and `w`
    * wins for `item`. The ONLY full-data shuffle in the Bradley-
    * Terry pipeline: the raw log aggregates to (a, b) pair counts
    * first (partial-agg/map-side combine does the heavy lifting),
    * then both orientations of the pair-sized frame union and
    * re-group — at 100 TB the second shuffle moves items² rows, not
    * log rows. */
  def orientedPairs(cmp: DataFrame, aCol: String, bCol: String,
      winACol: String): DataFrame = {
    val p = cmp
      .select(col(aCol).as("a"), col(bCol).as("b"),
        col(winACol).as("wa"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("wa"), 1L).otherwise(0L)).as("w"))
    p.select(col("a").as("item"), col("b").as("opp"), col("n"),
        col("w"))
      .unionAll(p.select(col("b").as("item"), col("a").as("opp"),
        col("n"), (col("n") - col("w")).as("w")))
      .groupBy(col("item"), col("opp"))
      .agg(sum(col("n")).as("n"), sum(col("w")).as("w"))
  }

  /** Bradley-Terry strengths by `iters` rounds of the MM update
    * (Hunter 2004): s_i ← W_i / Σ_j n_ij/(s_i+s_j), then
    * normalized so Σ s = |items|·1e6 — all in exact integers:
    *
    *  - strengths live in micro units (start 1e6 each);
    *  - the per-pair term is (n_ij·1e15) div (s_i+s_j) — int64-safe
    *    up to ~9e9 comparisons per pair, computed in decimal so
    *    anything past that degrades to a loud NULL, never a wrap;
    *  - per-item denominators, raw scores, and the normalizer are
    *    DECIMAL(38,0) sums with integral divides, so the oracle
    *    replays the identical chain in HUGEINT `//`.
    *
    * An item with zero wins converges to strength 0 (the MLE
    * boundary) — deterministic on both engines.
    *
    * Scale shape: `oriented` is items²-bounded (built by
    * [[orientedPairs]] from the raw log with one shuffle); every
    * round is two broadcast joins of the item-sized strength frame
    * onto it plus one pair-sized groupBy — nothing in the fixpoint
    * ever touches raw-log-sized data, so rounds cost the same at
    * 100 TB as at test scale. The item count is a driver count of
    * the item domain (models under comparison — bounded by
    * construction, like PageRank's vertex count).
    */
  def bradleyTerry(oriented: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val o = oriented
      .select(col("item"), col("opp"), col("n"), col("w"))
      .localCheckpoint(true)
    val items = o.select(col("item")).distinct().localCheckpoint(true)
    val nItems = items.count()
    require(nItems >= 2, s"need >= 2 items, got $nItems")
    val wins = o.groupBy(col("item"))
      .agg(sum(col("w")).as("wins"), sum(col("n")).as("n_cmp"))
      .localCheckpoint(true)
    val scaleMicro = nItems * 1000000L
    var s = items.select(col("item"), lit(1000000L).as("v"))
    for (_ <- 1 to iters) {
      val denom = o
        .join(broadcast(s.select(col("item"), col("v").as("vi"))),
          Seq("item"))
        .join(broadcast(s.select(col("item").as("opp"),
          col("v").as("vj"))), Seq("opp"))
        .select(col("item"),
          expr("(cast(n as decimal(38,0)) * 1000000000000000)" +
            " div (vi + vj)").as("term"))
        .groupBy(col("item"))
        .agg(sum(wide(col("term"))).as("denom"))
      val raw = denom
        .join(broadcast(wins.select(col("item"), col("wins"))),
          Seq("item"))
        .select(col("item"),
          expr("(cast(wins as decimal(38,0)) * 1000000000000000)" +
            " div denom").as("raw"))
        .localCheckpoint(true)
      s = raw
        .crossJoin(broadcast(raw.agg(sum(wide(col("raw"))).as("tot"))))
        .select(col("item"),
          expr(s"(cast(raw as decimal(38,0)) * $scaleMicro) div tot")
            .as("v"))
        .localCheckpoint(true)
    }
    s.join(broadcast(wins), Seq("item"))
      .select(col("item"), col("n_cmp"), col("wins"),
        col("v").as("strength_micro"))
  }

  /** Exact ROC-AUC by the rank-sum identity over the SCORE HISTOGRAM
    * (never row pairs): AUC·P·Q = #(pos>neg) + ½·#(pos==neg), so
    * with per-score positive/negative counts p_c, q_c and the
    * running negatives-below count,
    * 2U = Σ_c p_c·(2·q_below + q_c) — an integer. Returns one row
    * (n_pos, n_neg, two_u, auc_ppm) with
    * auc_ppm = (2U·5e5) div (P·Q).
    *
    * Scale shape: one partial-aggregated groupBy over the integral
    * score column, then a cumulative window over the HISTOGRAM
    * relation — bounded by the score domain (cents of a bounded
    * metric), not the row count, so the unpartitioned window is a
    * plan-time-bounded frame, same contract as the drift bins.
    *
    * @param scoreCol integral score (snap floats to cents first —
    *                 a float score would put engine rounding in the
    *                 histogram keys)
    * @param posCol   boolean label
    */
  def exactAuc(scored: DataFrame, scoreCol: Column,
      posCol: Column): DataFrame = {
    val h = scored
      .select(scoreCol.as("c"),
        when(posCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("c"))
      .agg(sum(col("y")).as("p"),
        (count(lit(1)) - sum(col("y"))).as("q"))
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = h
      .withColumn("q_below", coalesce(sum(col("q")).over(w), lit(0L)))
      .select(col("p"), col("q"),
        (wide(col("p")) * (lit(2L) * col("q_below") + col("q")))
          .as("u2"))
      .agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
        sum(col("u2")).as("two_u"))
    tot.select(col("n_pos"), col("n_neg"),
      col("two_u").cast("long").as("two_u"),
      expr("(two_u * 500000)" +
        " div (cast(n_pos as decimal(38,0)) * n_neg)").as("auc_ppm"))
  }

  /** Per-slice exact ROC-AUC ([[exactAuc]] partitioned by a group
    * column): the slice-based eval — does the model rank worse on
    * some segment? Identical rank-sum algebra per group; the
    * cumulative window partitions by the slice, so state per
    * partition is that slice's score histogram (bounded by the score
    * domain), and slices parallelize instead of serializing through
    * one global sort. Returns one row per slice. */
  def exactAucBy(scored: DataFrame, sliceCol: Column,
      scoreCol: Column, posCol: Column): DataFrame = {
    val h = scored
      .select(sliceCol.as("slice"), scoreCol.as("c"),
        when(posCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("slice"), col("c"))
      .agg(sum(col("y")).as("p"),
        (count(lit(1)) - sum(col("y"))).as("q"))
    val w = Window.partitionBy(col("slice")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("q_below", coalesce(sum(col("q")).over(w), lit(0L)))
      .select(col("slice"), col("p"), col("q"),
        (wide(col("p")) * (lit(2L) * col("q_below") + col("q")))
          .as("u2"))
      .groupBy(col("slice"))
      .agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
        sum(col("u2")).as("two_u"))
      .select(col("slice"), col("n_pos"), col("n_neg"),
        col("two_u").cast("long").as("two_u"),
        expr("(two_u * 500000)" +
          " div (cast(n_pos as decimal(38,0)) * n_neg)")
          .as("auc_ppm"))
  }

  /** Reliability diagram + expected calibration error in exact ppm:
    * predictions bucketed into `bins` equal-width confidence bins;
    * per bin the row count, confidence mass, positive count, and
    * |Σconf − pos·1e6| gap; ECE_ppm = (Σ gaps) div N rides every
    * row (a broadcast 1-row total). Confidence mass sums widen to
    * decimal and cast back — past-int64 totals degrade to loud
    * NULLs. One partial-aggregated groupBy; the bin frame is
    * plan-time bounded.
    *
    * @param confPpmCol predicted probability in ppm ∈ [0, 1e6)
    * @param posCol     boolean outcome
    */
  def calibrationBins(preds: DataFrame, confPpmCol: Column,
      posCol: Column, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val b = preds
      .select(confPpmCol.as("conf_ppm"),
        when(posCol, 1L).otherwise(0L).as("y"))
      .groupBy(expr(s"(conf_ppm * $bins) div 1000000").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(wide(col("conf_ppm"))).cast("long").as("sum_conf_ppm"),
        sum(col("y")).as("pos"))
      .withColumn("gap",
        abs(col("sum_conf_ppm") - col("pos") * lit(1000000L)))
    b.crossJoin(broadcast(b.agg(sum(wide(col("gap"))).as("gap_tot"),
        sum(col("n")).as("n_tot"))))
      .select(col("bin"), col("n"), col("sum_conf_ppm"), col("pos"),
        col("gap"), expr("gap_tot div n_tot").as("ece_ppm"))
  }

  /** Isotonic regression (PAVA) over an ordered bin histogram — the
    * recalibration step that FIXES what [[calibrationBins]] measures:
    * the least-squares monotone fit of per-bin hit rate as a
    * function of predicted confidence, computed by pool-adjacent-
    * violators in exact rational block algebra.
    *
    * Each pass pools every maximal descending run into one block
    * (the PAVA lemma: adjacent violators share a block in the
    * optimal fit, and run-pooling is just repeated adjacent pooling,
    * so iterated passes converge to THE unique L2 isotonic
    * solution). A pass with any violation reduces the block count,
    * so `bins` passes always suffice — the loop is unrolled at plan
    * time. Block values are never materialized as quotients until
    * the end: violation tests cross-multiply (pos_prev·n > pos·n_prev
    * in DECIMAL(38,0)), so every comparison is exact and the DuckDB
    * oracle replays the identical pass chain.
    *
    * Scale shape: the input is a BIN frame (bounded by the bin
    * count, a plan constant — the calibration-bins contract), so the
    * per-pass unpartitioned windows run over ≤bins rows; the
    * full-data work happened in the upstream aggregation.
    *
    * @param bins  frame with (bin, n, pos), n > 0, one row per
    *              populated bin
    * @return blocks (lo_bin, hi_bin, n, pos, fitted_ppm) ordered by
    *         lo_bin, fitted_ppm = pos·1e6 div n non-decreasing
    */
  def isotonicFit(bins: DataFrame, passes: Int): DataFrame = {
    require(passes >= 1, s"passes must be >= 1, got $passes")
    val ord = Window.orderBy(col("lo"))
    val run = Window.orderBy(col("lo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var blocks = bins
      .select(col("bin").as("lo"), col("bin").as("hi"), col("n"),
        col("pos"))
      .localCheckpoint(true)
    for (_ <- 1 to passes) {
      blocks = blocks
        .withColumn("prev_pos", lag(col("pos"), 1).over(ord))
        .withColumn("prev_n", lag(col("n"), 1).over(ord))
        .withColumn("grp", sum(when(col("prev_pos").isNull ||
            !(wide(col("prev_pos")) * col("n") >
              wide(col("pos")) * col("prev_n")), 1L)
          .otherwise(0L)).over(run))
        .groupBy(col("grp"))
        .agg(min(col("lo")).as("lo"), max(col("hi")).as("hi"),
          sum(col("n")).as("n"), sum(col("pos")).as("pos"))
        .select(col("lo"), col("hi"), col("n"), col("pos"))
        .localCheckpoint(true)
    }
    blocks
      .select(col("lo").as("lo_bin"), col("hi").as("hi_bin"),
        col("n"), col("pos"),
        expr("(cast(pos as decimal(38,0)) * 1000000) div n")
          .as("fitted_ppm"))
      .orderBy(col("lo_bin"))
  }

  /** Cohen's kappa inter-annotator agreement in exact ppm, plus the
    * per-class margins that localize a disagreement: for each label,
    * annotator-1 count, annotator-2 count, and the diagonal; kappa =
    * (agree·N − Σ_k r_k·c_k)·1e6 / (N² − Σ_k r_k·c_k). Kappa CAN be
    * negative (worse-than-chance agreement), so the sign is decided
    * by an explicit CASE and the division runs on the absolute
    * value — truncation-direction-proof across engines. One shuffle
    * builds the (a1, a2) contingency table; margins, diagonal, and
    * the scalar total all derive from that classes²-sized frame. */
  def cohenKappa(labeled: DataFrame, aCol: Column,
      bCol: Column): DataFrame = {
    val cont = labeled.select(aCol.as("a1"), bCol.as("a2"))
      .groupBy(col("a1"), col("a2"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint(true)
    val rows = cont.groupBy(col("a1").as("label"))
      .agg(sum(col("k")).as("row_n"))
    val cols = cont.groupBy(col("a2").as("label"))
      .agg(sum(col("k")).as("col_n"))
    val diag = cont.filter(col("a1") === col("a2"))
      .select(col("a1").as("label"), col("k").as("diag_n"))
    val m = rows.join(cols, Seq("label"), "full_outer")
      .join(diag, Seq("label"), "left_outer")
      .select(col("label"),
        coalesce(col("row_n"), lit(0L)).as("row_n"),
        coalesce(col("col_n"), lit(0L)).as("col_n"),
        coalesce(col("diag_n"), lit(0L)).as("diag_n"))
      .localCheckpoint(true)
    val tot = m.agg(
      sum(col("row_n")).cast("decimal(38,0)").as("n"),
      sum(col("diag_n")).cast("decimal(38,0)").as("agree"),
      sum(wide(col("row_n")) * col("col_n")).as("rc"))
    m.crossJoin(broadcast(tot))
      .select(col("label"), col("row_n"), col("col_n"),
        col("diag_n"),
        expr("""cast(case when agree * n - rc < 0
            then -(((rc - agree * n) * 1000000) div (n * n - rc))
            else ((agree * n - rc) * 1000000) div (n * n - rc)
          end as bigint)""").as("kappa_ppm"))
  }
}
