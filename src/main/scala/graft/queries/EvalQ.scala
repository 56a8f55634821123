package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.{Evals, Splits}

/** Model-evaluation / preference-analytics surface ([[Evals]]):
  * Bradley-Terry strengths over a synthetic pairwise preference log
  * (q233), exact ROC-AUC (q234), calibration bins + ECE (q235), and
  * Cohen's kappa annotator agreement (q236). The preference /
  * prediction / annotation columns are all md5-derived from
  * event_id — deterministic on any regeneration of the tables — and
  * every hashed value is an exact integer (micro/ppm units), so the
  * DuckDB oracles replay each chain bit-for-bit in HUGEINT.
  */
object EvalQ {

  /** q233 — Bradley-Terry model ranking from pairwise preferences
    * ([[Evals.bradleyTerry]], 3 MM rounds): the RLHF reward-data
    * computation — a preference log (two model ids + which won) in,
    * per-model strengths out. Each event synthesizes one comparison:
    * models a = id mod 8, b = (id div 8) mod 8 (a ≠ b), and the md5
    * percent-bucket decides the winner with probability
    * (a+1)/(a+b+2) — true Bradley-Terry odds with strengths 1..8, so
    * the recovered strengths must come back monotone in model id.
    * The oracle unrolls all three MM rounds (per-pair integral
    * terms, per-item denominators, the Σ=|I|·1e6 renormalization) in
    * HUGEINT. Scale shape: one shuffle aggregates the raw log to
    * pair counts; the fixpoint never touches log-sized data. */
  val q233 = Qry(
    "q233_bradley_terry",
    (s: SparkSession, d: String) => {
      val cmp = Tables.events(s, d)
        .select(expr("event_id % 8").as("a"),
          expr("(event_id div 8) % 8").as("b"),
          Splits.hashBucket(col("event_id")).cast("long").as("bucket"))
        .filter(col("a") =!= col("b"))
        .select(col("a"), col("b"),
          (col("bucket") * (col("a") + col("b") + lit(2L)) <
            lit(100L) * (col("a") + lit(1L))).as("wa"))
      Evals.bradleyTerry(
          Evals.orientedPairs(cmp, "a", "b", "wa"), iters = 3)
        .orderBy(col("item"))
    },
    Some(s"""
      WITH raw AS (
        SELECT CAST(event_id % 8 AS BIGINT) AS a,
               CAST((event_id // 8) % 8 AS BIGINT) AS b,
               CAST(${Q.bucketSql("event_id")} AS BIGINT) AS bucket
        FROM events),
      cmp AS (
        SELECT a, b, (bucket * (a + b + 2) < 100 * (a + 1)) AS wa
        FROM raw WHERE a <> b),
      p AS (
        SELECT a, b, COUNT(*) AS n,
               SUM(CASE WHEN wa THEN 1 ELSE 0 END) AS w
        FROM cmp GROUP BY 1, 2),
      o AS (
        SELECT item, opp, CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(w) AS BIGINT) AS w
        FROM (SELECT a AS item, b AS opp, n, w FROM p
              UNION ALL
              SELECT b AS item, a AS opp, n, n - w FROM p)
        GROUP BY 1, 2),
      wins AS (
        SELECT item, CAST(SUM(w) AS BIGINT) AS wins,
               CAST(SUM(n) AS BIGINT) AS n_cmp
        FROM o GROUP BY 1),
      s0 AS (SELECT DISTINCT item, CAST(1000000 AS HUGEINT) AS v
             FROM o),
      d1 AS (
        SELECT o.item,
               SUM((CAST(o.n AS HUGEINT) * 1000000000000000)
                 // (si.v + sj.v)) AS denom
        FROM o JOIN s0 si ON si.item = o.item
               JOIN s0 sj ON sj.item = o.opp GROUP BY 1),
      r1 AS (
        SELECT w.item,
               (CAST(w.wins AS HUGEINT) * 1000000000000000)
                 // d.denom AS raw
        FROM wins w JOIN d1 d ON d.item = w.item),
      s1 AS (
        SELECT item,
               (raw * (SELECT COUNT(*) FROM s0) * 1000000)
                 // (SELECT SUM(raw) FROM r1) AS v
        FROM r1),
      d2 AS (
        SELECT o.item,
               SUM((CAST(o.n AS HUGEINT) * 1000000000000000)
                 // (si.v + sj.v)) AS denom
        FROM o JOIN s1 si ON si.item = o.item
               JOIN s1 sj ON sj.item = o.opp GROUP BY 1),
      r2 AS (
        SELECT w.item,
               (CAST(w.wins AS HUGEINT) * 1000000000000000)
                 // d.denom AS raw
        FROM wins w JOIN d2 d ON d.item = w.item),
      s2 AS (
        SELECT item,
               (raw * (SELECT COUNT(*) FROM s0) * 1000000)
                 // (SELECT SUM(raw) FROM r2) AS v
        FROM r2),
      d3 AS (
        SELECT o.item,
               SUM((CAST(o.n AS HUGEINT) * 1000000000000000)
                 // (si.v + sj.v)) AS denom
        FROM o JOIN s2 si ON si.item = o.item
               JOIN s2 sj ON sj.item = o.opp GROUP BY 1),
      r3 AS (
        SELECT w.item,
               (CAST(w.wins AS HUGEINT) * 1000000000000000)
                 // d.denom AS raw
        FROM wins w JOIN d3 d ON d.item = w.item),
      s3 AS (
        SELECT item,
               (raw * (SELECT COUNT(*) FROM s0) * 1000000)
                 // (SELECT SUM(raw) FROM r3) AS v
        FROM r3)
      SELECT s3.item, wins.n_cmp, wins.wins,
             CAST(s3.v AS BIGINT) AS strength_micro
      FROM s3 JOIN wins ON wins.item = s3.item
      ORDER BY s3.item"""))

  /** q234 — exact ROC-AUC ([[Evals.exactAuc]]) for purchase-vs-view
    * classification: the rank-sum identity over the score histogram
    * with exact tie credit — the eval-harness metric computed
    * without a single float. The score is a 16-bit md5 draw shifted
    * up a quarter range for positives (the fixture's event values
    * are type-independent, so a planted separation keeps the metric
    * non-trivial on ANY regeneration): analytic AUC = 1/2 + 1/4 −
    * 1/32 = 0.71875, so auc_ppm must land near 718750 with only
    * binomial noise. One histogram shuffle; the cumulative window
    * runs over the bounded 0..81919 score domain, never over rows. */
  val q234 = Qry(
    "q234_exact_auc",
    (s: SparkSession, d: String) => {
      val h1 = conv(substring(md5(col("event_id").cast("string")),
        1, 4), 16, 10).cast("long")
      val pos = col("event_type") === "purchase"
      Evals.exactAuc(
        Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "view")),
        h1 + when(pos, 16384L).otherwise(0L), pos)
    },
    Some(s"""
      WITH t AS (
        SELECT CAST(${Q.md5Hex16Sql("event_id", 1)}
                 + CASE WHEN event_type = 'purchase'
                   THEN 16384 ELSE 0 END AS BIGINT) AS c,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                 AS y
        FROM events WHERE event_type IN ('purchase', 'view')),
      h AS (
        SELECT c, CAST(SUM(y) AS BIGINT) AS p,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS q
        FROM t GROUP BY 1),
      w AS (
        SELECT p, q,
               COALESCE(SUM(q) OVER (ORDER BY c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS q_below
        FROM h),
      tot AS (
        SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
               CAST(SUM(q) AS BIGINT) AS n_neg,
               SUM(CAST(p AS HUGEINT) * (2 * q_below + q)) AS two_u
        FROM w)
      SELECT n_pos, n_neg, CAST(two_u AS BIGINT) AS two_u,
             CAST((two_u * 500000)
               // (CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
               AS auc_ppm
      FROM tot"""))

  /** q235 — reliability diagram + expected calibration error
    * ([[Evals.calibrationBins]], 10 bins): predicted confidence =
    * md5 nibbles 1-4 of the event id rescaled to ppm, outcome = a
    * second independent md5 draw under the confidence — perfectly
    * calibrated in expectation, so the per-bin gaps are pure
    * binomial noise and ECE is small but nonzero. Every gap is an
    * exact |Σconf − pos·1e6| integer; the oracle replays bins, gaps,
    * and the ECE division. */
  val q235 = Qry(
    "q235_calibration_ece",
    (s: SparkSession, d: String) => {
      val h1 = conv(substring(md5(col("event_id").cast("string")),
        1, 4), 16, 10).cast("long")
      val h2 = conv(substring(md5(col("event_id").cast("string")),
        5, 4), 16, 10).cast("long")
      Evals.calibrationBins(
          Tables.events(s, d)
            .select(h1.as("h1"), h2.as("h2"))
            .select(expr("(h1 * 1000000) div 65536").as("conf_ppm"),
              (col("h2") < col("h1")).as("hit")),
          col("conf_ppm"), col("hit"), bins = 10)
        .orderBy(col("bin"))
    },
    Some(s"""
      WITH t AS (
        SELECT (CAST(${Q.md5Hex16Sql("event_id", 1)} AS BIGINT)
                 * 1000000) // 65536 AS conf_ppm,
               CASE WHEN ${Q.md5Hex16Sql("event_id", 5)}
                 < ${Q.md5Hex16Sql("event_id", 1)}
                 THEN 1 ELSE 0 END AS y
        FROM events),
      b AS (
        SELECT (conf_ppm * 10) // 1000000 AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(conf_ppm) AS BIGINT) AS sum_conf_ppm,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM t GROUP BY 1),
      g AS (
        SELECT bin, n, sum_conf_ppm, pos,
               abs(sum_conf_ppm - pos * 1000000) AS gap
        FROM b),
      tot AS (
        SELECT SUM(CAST(gap AS HUGEINT)) AS gap_tot,
               CAST(SUM(n) AS BIGINT) AS n_tot
        FROM g)
      SELECT bin, n, sum_conf_ppm, pos, CAST(gap AS BIGINT) AS gap,
             CAST(gap_tot // n_tot AS BIGINT) AS ece_ppm
      FROM g, tot ORDER BY bin"""))

  /** q236 — Cohen's kappa inter-annotator agreement
    * ([[Evals.cohenKappa]]): annotator 1 labels each event with its
    * type; annotator 2 agrees except on a fixed 20% md5 bucket,
    * where the label shifts one step along a fixed type cycle —
    * chance-corrected agreement lands near 0.75 rather than the raw
    * 0.80, and the per-class margins localize WHERE annotators
    * diverge. Exact ppm with the sign decided before the integral
    * divide. The label-quality audit every human-preference
    * collection runs before training on the labels. */
  val q236 = Qry(
    "q236_cohen_kappa",
    (s: SparkSession, d: String) => {
      val cyc = expr("""case event_type
          when 'view' then 'click' when 'click' then 'purchase'
          when 'purchase' then 'signup' when 'signup' then 'error'
          else 'view' end""")
      Evals.cohenKappa(
          Tables.events(s, d)
            .select(col("event_type").as("a1"),
              when(Splits.hashBucket(col("event_id")) < 20, cyc)
                .otherwise(col("event_type")).as("a2")),
          col("a1"), col("a2"))
        .orderBy(col("label"))
    },
    Some(s"""
      WITH t AS (
        SELECT event_type AS a1,
               CASE WHEN ${Q.bucketSql("event_id")} < 20 THEN
                 CASE event_type
                   WHEN 'view' THEN 'click'
                   WHEN 'click' THEN 'purchase'
                   WHEN 'purchase' THEN 'signup'
                   WHEN 'signup' THEN 'error'
                   ELSE 'view' END
               ELSE event_type END AS a2
        FROM events),
      cont AS (SELECT a1, a2, COUNT(*) AS k FROM t GROUP BY 1, 2),
      rmarg AS (SELECT a1 AS label, CAST(SUM(k) AS BIGINT) AS row_n
                FROM cont GROUP BY 1),
      cmarg AS (SELECT a2 AS label, CAST(SUM(k) AS BIGINT) AS col_n
                FROM cont GROUP BY 1),
      diag AS (SELECT a1 AS label, CAST(k AS BIGINT) AS diag_n
               FROM cont WHERE a1 = a2),
      m AS (
        SELECT COALESCE(r.label, c.label) AS label,
               COALESCE(row_n, 0) AS row_n,
               COALESCE(col_n, 0) AS col_n
        FROM rmarg r FULL OUTER JOIN cmarg c ON r.label = c.label),
      m2 AS (
        SELECT m.label, row_n, col_n,
               COALESCE(diag_n, 0) AS diag_n
        FROM m LEFT JOIN diag ON diag.label = m.label),
      tot AS (
        SELECT CAST(SUM(row_n) AS HUGEINT) AS n,
               CAST(SUM(diag_n) AS HUGEINT) AS agree,
               SUM(CAST(row_n AS HUGEINT) * col_n) AS rc
        FROM m2)
      SELECT label, row_n, col_n, diag_n,
             CAST(CASE WHEN agree * n - rc < 0
               THEN -(((rc - agree * n) * 1000000) // (n * n - rc))
               ELSE ((agree * n - rc) * 1000000) // (n * n - rc)
               END AS BIGINT) AS kappa_ppm
      FROM m2, tot ORDER BY label"""))

  /** q238 — per-slice exact AUC ([[Evals.exactAucBy]]): q234's
    * metric partitioned by user cohort (user_id mod 4) — the
    * slice-based eval that catches a model ranking worse on one
    * segment. Same planted ¼-range separation, so every slice must
    * land near the analytic 718750 ppm independently; the cumulative
    * window partitions by slice (per-slice histogram state, slices
    * parallelize). */
  val q238 = Qry(
    "q238_auc_by_slice",
    (s: SparkSession, d: String) => {
      val h1 = conv(substring(md5(col("event_id").cast("string")),
        1, 4), 16, 10).cast("long")
      val pos = col("event_type") === "purchase"
      Evals.exactAucBy(
          Tables.events(s, d)
            .filter(col("event_type").isin("purchase", "view")),
          pmod(col("user_id"), lit(4L)), h1 +
            when(pos, 16384L).otherwise(0L), pos)
        .orderBy(col("slice"))
    },
    Some(s"""
      WITH t AS (
        SELECT user_id % 4 AS slice,
               CAST(${Q.md5Hex16Sql("event_id", 1)}
                 + CASE WHEN event_type = 'purchase'
                   THEN 16384 ELSE 0 END AS BIGINT) AS c,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                 AS y
        FROM events WHERE event_type IN ('purchase', 'view')),
      h AS (
        SELECT slice, c, CAST(SUM(y) AS BIGINT) AS p,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS q
        FROM t GROUP BY 1, 2),
      w AS (
        SELECT slice, p, q,
               COALESCE(SUM(q) OVER (PARTITION BY slice ORDER BY c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS q_below
        FROM h),
      tot AS (
        SELECT slice, CAST(SUM(p) AS BIGINT) AS n_pos,
               CAST(SUM(q) AS BIGINT) AS n_neg,
               SUM(CAST(p AS HUGEINT) * (2 * q_below + q)) AS two_u
        FROM w GROUP BY slice)
      SELECT slice, n_pos, n_neg, CAST(two_u AS BIGINT) AS two_u,
             CAST((two_u * 500000)
               // (CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
               AS auc_ppm
      FROM tot ORDER BY slice"""))

  private val IsoBins = 8

  /** One PAVA pass in DuckDB: lag the block stats, start a new group
    * wherever the previous block does NOT violate (cross-multiplied
    * in HUGEINT), pool groups. */
  private def isoPassSql(prev: String, out: String) = s"""
      $out AS (
        SELECT MIN(lo) AS lo, MAX(hi) AS hi,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS pos
        FROM (
          SELECT lo, hi, n, pos,
                 SUM(CASE WHEN prev_pos IS NULL OR NOT
                   (CAST(prev_pos AS HUGEINT) * n >
                    CAST(pos AS HUGEINT) * prev_n)
                   THEN 1 ELSE 0 END)
                   OVER (ORDER BY lo
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS grp
          FROM (
            SELECT lo, hi, n, pos,
                   LAG(pos) OVER (ORDER BY lo) AS prev_pos,
                   LAG(n) OVER (ORDER BY lo) AS prev_n
            FROM $prev))
        GROUP BY grp)"""

  /** q239 — isotonic recalibration ([[Evals.isotonicFit]], PAVA):
    * the monotone least-squares fit of hit rate vs predicted
    * confidence — the step that FIXES the miscalibration q235
    * measures. The fixture's true hit rate is a TRIANGLE in the
    * confidence (rises to the midpoint, then falls — md5-derived, so
    * the shape survives any regeneration): the falling half
    * guarantees adjacent violators at every scale, so the fit must
    * pool blocks, and the emitted block structure + exact rational
    * block values pin the whole PAVA trajectory. The oracle replays
    * all [[IsoBins]] unrolled passes (idempotent once monotone) with
    * identical HUGEINT cross-multiplied comparisons. */
  val q239 = Qry(
    "q239_isotonic_calibration",
    (s: SparkSession, d: String) => {
      val h1 = conv(substring(md5(col("event_id").cast("string")),
        1, 4), 16, 10).cast("long")
      val h2 = conv(substring(md5(col("event_id").cast("string")),
        5, 4), 16, 10).cast("long")
      val bins = Tables.events(s, d)
        .select(h1.as("h1"), h2.as("h2"))
        .select(expr(s"(h1 * $IsoBins) div 65536").as("bin"),
          when(col("h2") < when(col("h1") < 32768L, col("h1"))
            .otherwise(lit(65536L) - col("h1")), 1L)
            .otherwise(0L).as("y"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      Evals.isotonicFit(bins, passes = IsoBins)
    },
    Some {
      val passes = (1 to IsoBins)
        .map(i => isoPassSql(s"pass${i - 1}", s"pass$i"))
        .mkString(",")
      s"""
      WITH t AS (
        SELECT (${Q.md5Hex16Sql("event_id", 1)} * $IsoBins) // 65536
                 AS bin,
               CASE WHEN ${Q.md5Hex16Sql("event_id", 5)} <
                 (CASE WHEN ${Q.md5Hex16Sql("event_id", 1)} < 32768
                  THEN ${Q.md5Hex16Sql("event_id", 1)}
                  ELSE 65536 - ${Q.md5Hex16Sql("event_id", 1)} END)
                 THEN 1 ELSE 0 END AS y
        FROM events),
      pass0 AS (
        SELECT CAST(bin AS BIGINT) AS lo, CAST(bin AS BIGINT) AS hi,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM t GROUP BY bin),
      $passes
      SELECT lo AS lo_bin, hi AS hi_bin, n, pos,
             CAST((CAST(pos AS HUGEINT) * 1000000) // n AS BIGINT)
               AS fitted_ppm
      FROM pass$IsoBins ORDER BY lo_bin"""
    })

  /** q240 — Spearman rank correlation with exact tie handling
    * ([[Evals.spearman]]): do two scorers rank the corpus the same
    * way? Scorer 1 = event value in cents; scorer 2 = the same
    * signal plus a ±32768 md5 noise term (two imperfectly-agreeing
    * quality models). Doubled mid-ranks keep every rank an integer,
    * the five moments accumulate in DECIMAL(38,0)/HUGEINT, and ρ is
    * one identical IEEE double expression both engines evaluate on
    * identical integers (the q88 contract). */
  val q240 = Qry(
    "q240_spearman",
    (s: SparkSession, d: String) => {
      val h1 = conv(substring(md5(col("event_id").cast("string")),
        1, 4), 16, 10).cast("long")
      val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
      Evals.spearman(
        Tables.events(s, d)
          .select(cents.as("x"), (cents + h1 - lit(32768L)).as("y")),
        col("x"), col("y"))
    },
    Some(s"""
      WITH t AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
               CAST(floor(value * 100 + 0.5) AS BIGINT)
                 + ${Q.md5Hex16Sql("event_id", 1)} - 32768 AS y
        FROM events),
      rx AS (
        SELECT x,
               2 * (SUM(COUNT(*)) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - COUNT(*)) + COUNT(*) + 1 AS r2x
        FROM t GROUP BY x),
      ry AS (
        SELECT y,
               2 * (SUM(COUNT(*)) OVER (ORDER BY y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - COUNT(*)) + COUNT(*) + 1 AS r2y
        FROM t GROUP BY y),
      j AS (
        SELECT r2x, r2y FROM t
        JOIN rx ON rx.x = t.x JOIN ry ON ry.y = t.y),
      m AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(r2x AS HUGEINT)) AS sx,
               SUM(CAST(r2y AS HUGEINT)) AS sy,
               SUM(CAST(r2x AS HUGEINT) * r2x) AS sxx,
               SUM(CAST(r2y AS HUGEINT) * r2y) AS syy,
               SUM(CAST(r2x AS HUGEINT) * r2y) AS sxy
        FROM j)
      SELECT n,
             FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               * 1e6 + 0.5) / 1e6 AS rho
      FROM m"""))

  /** q241 — Fleiss' kappa for 3 raters ([[Evals.fleissKappa]]):
    * rater 0 labels each event with its type; raters 1 and 2 flip to
    * the next type on independent 20% md5 buckets. The per-item
    * agreement collapses map-side (Σ n_ic² = k + 2·equal-pairs);
    * only the category marginals shuffle. Chance-corrected
    * multi-rater agreement in exact ppm with sign-split division. */
  val q241 = Qry(
    "q241_fleiss_kappa",
    (s: SparkSession, d: String) => {
      val cyc = expr("""case event_type
          when 'view' then 'click' when 'click' then 'purchase'
          when 'purchase' then 'signup' when 'signup' then 'error'
          else 'view' end""")
      def h16(off: Int) = conv(substring(
        md5(col("event_id").cast("string")), off, 4), 16, 10)
        .cast("long")
      Evals.fleissKappa(
        Tables.events(s, d).select(col("event_type").as("l0"),
          when(h16(5) < 13107L, cyc).otherwise(col("event_type"))
            .as("l1"),
          when(h16(9) < 13107L, cyc).otherwise(col("event_type"))
            .as("l2")),
        Seq(col("l0"), col("l1"), col("l2")))
    },
    Some(s"""
      WITH t AS (
        SELECT event_type AS l0,
               CASE WHEN ${Q.md5Hex16Sql("event_id", 5)} < 13107
                 THEN ${fleissCycSql} ELSE event_type END AS l1,
               CASE WHEN ${Q.md5Hex16Sql("event_id", 9)} < 13107
                 THEN ${fleissCycSql} ELSE event_type END AS l2
        FROM events),
      tot AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(CASE WHEN l0 = l1 THEN 1 ELSE 0 END
                 + CASE WHEN l0 = l2 THEN 1 ELSE 0 END
                 + CASE WHEN l1 = l2 THEN 1 ELSE 0 END AS HUGEINT))
                 AS e
        FROM t),
      marg AS (
        SELECT category, CAST(COUNT(*) AS BIGINT) AS c_total
        FROM (SELECT unnest([l0, l1, l2]) AS category FROM t)
        GROUP BY 1),
      b AS (SELECT SUM(CAST(c_total AS HUGEINT) * c_total) AS bb
            FROM marg),
      kv AS (
        SELECT CAST(n AS HUGEINT) * 3 AS nk, e, bb, n
        FROM tot, b),
      kp AS (
        SELECT 2 * e * nk * nk - bb * nk * 2 AS num,
               nk * 2 * (nk * nk - bb) AS den
        FROM kv)
      SELECT category, c_total,
             CAST(CASE WHEN num < 0
               THEN -(((-num) * 1000000) // den)
               ELSE (num * 1000000) // den END AS BIGINT)
               AS kappa_ppm
      FROM marg, kp ORDER BY category"""))

  private val OpThresholds = (1 to 8).map(_ * 8192L)

  /** q242 — classifier operating points ([[Evals.operatingPoints]]):
    * the full confusion matrix + precision/recall/F1 (all exact ppm,
    * F1 as the rational 2tp/(2tp+fp+fn)) at 8 fixed thresholds over
    * q234's planted-separation score — the PR-curve table an eval
    * harness prints. Histogram × plan-constant thresholds, one
    * partial-agg pass over rows. */
  val q242 = Qry(
    "q242_operating_points",
    (s: SparkSession, d: String) => {
      val h1 = conv(substring(md5(col("event_id").cast("string")),
        1, 4), 16, 10).cast("long")
      val pos = col("event_type") === "purchase"
      Evals.operatingPoints(
        Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "view")),
        h1 + when(pos, 16384L).otherwise(0L), pos, OpThresholds)
    },
    Some(s"""
      WITH t AS (
        SELECT CAST(${Q.md5Hex16Sql("event_id", 1)}
                 + CASE WHEN event_type = 'purchase'
                   THEN 16384 ELSE 0 END AS BIGINT) AS c,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                 AS y
        FROM events WHERE event_type IN ('purchase', 'view')),
      th AS (SELECT CAST(unnest([${OpThresholds.mkString(", ")}])
               AS BIGINT) AS t),
      g AS (
        SELECT th.t,
               CAST(SUM(CASE WHEN c >= th.t THEN y ELSE 0 END)
                 AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN c >= th.t THEN 1 - y ELSE 0 END)
                 AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN c < th.t THEN y ELSE 0 END)
                 AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN c < th.t THEN 1 - y ELSE 0 END)
                 AS BIGINT) AS tn
        FROM t, th GROUP BY th.t)
      SELECT t, tp, fp, fn, tn,
             CAST((CAST(tp AS HUGEINT) * 1000000) // (tp + fp)
               AS BIGINT) AS precision_ppm,
             CAST((CAST(tp AS HUGEINT) * 1000000) // (tp + fn)
               AS BIGINT) AS recall_ppm,
             CAST((CAST(tp AS HUGEINT) * 2000000)
               // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm
      FROM g ORDER BY t"""))

  private def fleissCycSql = """CASE event_type
      WHEN 'view' THEN 'click' WHEN 'click' THEN 'purchase'
      WHEN 'purchase' THEN 'signup' WHEN 'signup' THEN 'error'
      ELSE 'view' END"""

  /** q244 — leakage-safe target encoding
    * ([[Evals.targetEncodeLoo]], m = 20): each event's type replaced
    * by the leave-one-out and smoothed mean of the value target over
    * its category — computed over the FULL stream, reported for a
    * bounded id slice (the q81 contract). Exact micro-units with μ
    * cleared of its denominator, so the feature a training run reads
    * is bit-reproducible. Category sums broadcast; the encode is
    * map-side. */
  val q244 = Qry(
    "q244_target_encoding",
    (s: SparkSession, d: String) =>
      Evals.targetEncodeLoo(
          Tables.events(s, d),
          col("event_id"), col("event_type"),
          floor(col("value") * 100 + lit(0.5)).cast("long"), m = 20)
        .filter(col("id") < 300)
        .orderBy(col("id")),
    Some("""
      WITH t AS (
        SELECT event_id AS id, event_type AS cat,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        FROM events),
      cats AS (
        SELECT cat, CAST(SUM(y) AS BIGINT) AS sum_y,
               CAST(COUNT(*) AS BIGINT) AS n_cat
        FROM t GROUP BY 1),
      tot AS (
        SELECT CAST(SUM(sum_y) AS BIGINT) AS total,
               CAST(SUM(n_cat) AS BIGINT) AS n_all
        FROM cats)
      SELECT id, cat, y, n_cat,
             CASE WHEN n_cat > 1 THEN
               CAST(((CAST(sum_y AS HUGEINT) - y) * 1000000)
                 // (n_cat - 1) AS BIGINT) END AS loo_micro,
             CAST((((CAST(sum_y AS HUGEINT) - y) * n_all
                 + 20 * CAST(total AS HUGEINT)) * 1000000)
               // ((n_cat - 1 + 20) * CAST(n_all AS HUGEINT))
               AS BIGINT) AS smoothed_micro
      FROM t JOIN cats USING (cat), tot
      WHERE id < 300 ORDER BY id"""))

  /** q247 — Kendall rank correlation over quantized scores
    * ([[Evals.kendallGrid]]): concordant/discordant/tied pair
    * counts WITHOUT enumerating pairs — 2-D dominance prefix sums
    * over the densified 64×64 score lattice (bounded, the binned-
    * AUC contract); τ-a exact ppm with sign-split division, τ-b
    * from the same integers through one shared IEEE sqrt. The two
    * scores share an md5 signal (y = x + noise, clamped), so τ is
    * materially positive; truncation-direction parity on the
    * clamped negative dividends is argued in the scaladoc (both
    * engines clamp to 0 before anything diverges). */
  val q247 = Qry(
    "q247_kendall_tau",
    (s: SparkSession, d: String) => {
      val h1 = conv(substring(md5(col("event_id").cast("string")),
        1, 4), 16, 10).cast("long")
      val h2 = conv(substring(md5(col("event_id").cast("string")),
        5, 4), 16, 10).cast("long")
      Evals.kendallGrid(
        Tables.events(s, d)
          .select(h1.as("h1"), h2.as("h2"))
          .select(expr("h1 div 1024").as("x"),
            greatest(least(
              expr("(h1 + 2 * (h2 - 32768)) div 1024"), lit(63L)),
              lit(0L)).as("y")),
        col("x"), col("y"))
    },
    Some(s"""
      WITH raw AS (
        SELECT CAST(${Q.md5Hex16Sql("event_id", 1)} AS BIGINT) AS h1,
               CAST(${Q.md5Hex16Sql("event_id", 5)} AS BIGINT) AS h2
        FROM events),
      t AS (
        SELECT h1 // 1024 AS x,
               GREATEST(LEAST((h1 + 2 * (h2 - 32768)) // 1024, 63),
                 0) AS y
        FROM raw),
      g AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n
            FROM t GROUP BY 1, 2),
      dense AS (
        SELECT xs.x, ys.y, COALESCE(g.n, 0) AS n
        FROM (SELECT DISTINCT x FROM g) xs
        CROSS JOIN (SELECT DISTINCT y FROM g) ys
        LEFT JOIN g ON g.x = xs.x AND g.y = ys.y),
      aa AS (
        SELECT x, y, n,
               COALESCE(SUM(n) OVER (PARTITION BY y ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS a
        FROM dense),
      cll AS (
        SELECT x, y, n, a,
               COALESCE(SUM(a) OVER (PARTITION BY x ORDER BY y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS c_ll
        FROM aa),
      ct AS (SELECT x, CAST(SUM(n) AS BIGINT) AS tx
             FROM g GROUP BY x),
      tb AS (
        SELECT x,
               COALESCE(SUM(tx) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS t_below
        FROM ct),
      cells AS (
        SELECT cll.x, cll.y, n, c_ll,
               t_below - c_ll - a AS c_lu
        FROM cll JOIN tb ON tb.x = cll.x),
      tots AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n,
               SUM(CAST(n AS HUGEINT) * c_ll) AS c,
               SUM(CAST(n AS HUGEINT) * c_lu) AS d,
               SUM(CAST(n AS HUGEINT) * (n - 1)) AS txy2
        FROM cells),
      mx AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1)) AS tx2
             FROM (SELECT CAST(SUM(n) AS BIGINT) AS t
                   FROM g GROUP BY x)),
      my AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1)) AS ty2
             FROM (SELECT CAST(SUM(n) AS BIGINT) AS t
                   FROM g GROUP BY y))
      SELECT n, CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
             CAST((tx2 - txy2) // 2 AS BIGINT) AS tied_x,
             CAST((ty2 - txy2) // 2 AS BIGINT) AS tied_y,
             CAST(txy2 // 2 AS BIGINT) AS tied_xy,
             CAST(CASE WHEN c - d < 0
               THEN -(((d - c) * 2000000)
                 // (CAST(n AS HUGEINT) * (n - 1)))
               ELSE ((c - d) * 2000000)
                 // (CAST(n AS HUGEINT) * (n - 1)) END AS BIGINT)
               AS tau_a_ppm,
             FLOOR((CAST(c AS DOUBLE) - CAST(d AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                   / 2 - CAST(tx2 AS DOUBLE) / 2)
                 * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                   / 2 - CAST(ty2 AS DOUBLE) / 2))
               * 1e6 + 0.5) / 1e6 AS tau_b
      FROM tots, mx, my"""))

  private val BootReps = 8

  /** DuckDB binomial(8, 1/8) multiplier weight for replicate `b`:
    * count of the first 8 md5 nibbles of (event_id, b) that fall in
    * {0, 1} — mean-1 integer weights, deterministic on any engine
    * and any regeneration. */
  private def bootWSql(b: Int): String =
    (1 to 8).map(i =>
      s"""(CASE WHEN substr(md5(CAST(event_id AS VARCHAR)
          || '_$b'), $i, 1) IN ('0', '1') THEN 1 ELSE 0 END)""")
      .mkString("(", " + ", ")")

  /** q251 — multiplier-bootstrap AUC confidence band
    * ([[Evals.bootstrapAucReplicates]], 8 replicates): each row's
    * weight in replicate b is a binomial(8, 1/8) md5 draw (mean 1 —
    * the Poisson bootstrap's deterministic twin), and each
    * replicate's AUC is the exact rank-sum over the weighted
    * histogram — uncertainty for q234's point estimate WITHOUT a
    * random number generator, so the whole band is
    * regeneration-stable and oracle-replayable. All 8 replicates
    * ride ONE histogram aggregation + ONE window pass. */
  val q251 = Qry(
    "q251_bootstrap_auc",
    (s: SparkSession, d: String) => {
      val h1 = conv(substring(md5(col("event_id").cast("string")),
        1, 4), 16, 10).cast("long")
      val pos = col("event_type") === "purchase"
      def wB(b: Int) = (1 to 8).map(i =>
        when(substring(md5(concat(col("event_id").cast("string"),
          lit(s"_$b"))), i, 1).isin("0", "1"), 1L).otherwise(0L))
        .reduce(_ + _)
      Evals.bootstrapAucReplicates(
        Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "view")),
        h1 + when(pos, 16384L).otherwise(0L), pos,
        (0 until BootReps).map(wB))
    },
    Some {
      val ws = (0 until BootReps)
        .map(b => s"${bootWSql(b)} AS w$b").mkString(",\n               ")
      val hs = (0 until BootReps).map(b =>
        s"""CAST(SUM(CASE WHEN y = 1 THEN w$b ELSE 0 END) AS BIGINT)
               AS pw$b,
             CAST(SUM(CASE WHEN y = 0 THEN w$b ELSE 0 END) AS BIGINT)
               AS qw$b""").mkString(",\n             ")
      val qbs = (0 until BootReps).map(b =>
        s"""COALESCE(SUM(qw$b) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS qb$b""").mkString(",\n             ")
      val tots = (0 until BootReps).map(b =>
        s"""CAST(SUM(pw$b) AS BIGINT) AS np$b,
             CAST(SUM(qw$b) AS BIGINT) AS nq$b,
             SUM(CAST(pw$b AS HUGEINT) * (2 * qb$b + qw$b)) AS tu$b""")
        .mkString(",\n             ")
      val reps = (0 until BootReps).map(b =>
        s"SELECT $b AS replicate, np$b AS n_pos_w, nq$b AS n_neg_w," +
          s" tu$b AS tu FROM one").mkString("\n        UNION ALL ")
      s"""
      WITH t AS (
        SELECT CAST(${Q.md5Hex16Sql("event_id", 1)}
                 + CASE WHEN event_type = 'purchase'
                   THEN 16384 ELSE 0 END AS BIGINT) AS c,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                 AS y,
               $ws
        FROM events WHERE event_type IN ('purchase', 'view')),
      h AS (
        SELECT c,
             $hs
        FROM t GROUP BY c),
      wnd AS (
        SELECT *,
             $qbs
        FROM h),
      one AS (
        SELECT
             $tots
        FROM wnd),
      reps AS (
        $reps)
      SELECT replicate, n_pos_w, n_neg_w, CAST(tu AS BIGINT) AS two_u,
             CAST((tu * 500000)
               // (CAST(n_pos_w AS HUGEINT) * n_neg_w) AS BIGINT)
               AS auc_ppm
      FROM reps WHERE n_pos_w > 0 AND n_neg_w > 0
      ORDER BY replicate"""
    })

  val all: Seq[Qry] =
    Seq(q233, q234, q235, q236, q238, q239, q240, q241, q242, q244,
      q247, q251)
}
