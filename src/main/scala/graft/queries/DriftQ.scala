package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.Drift

/** Dataset-drift surface: q193 histogram drift between two snapshots
  * ([[Drift.histDrift]]) — baseline-anchored equi-width bins,
  * Laplace-smoothed shares, and the two ln-free divergences (total
  * variation + chi-square) whose per-bin contributions the oracle
  * replays bit-for-bit. The 'view' events play the baseline
  * snapshot, 'purchase' the candidate — materially different value
  * distributions, so the drift scores are non-trivial.
  *
  * Hashed columns are pure BIGINT parts-per-billion (the
  * [[Drift]] integer-ppb determinism contract): both engines run the
  * identical integer multiply/divide chain from the exact bin
  * counts, so no float rounding can diverge the gate on any data
  * (the r9 q193/q200 hash-only misses were exactly this).
  */
object DriftQ {

  private val Bins = 8

  /** DuckDB body shared by q193/q200: tag → baseline range → bin →
    * per-bin side counts → densified bins with totals. */
  private def binCountsSql(bins: Int) = s"""
      WITH t AS (
        SELECT value AS v, event_type = 'view' AS is_base
        FROM events WHERE event_type IN ('view', 'purchase')),
      r AS (SELECT min(v) AS lo, max(v) AS hi FROM t WHERE is_base),
      b AS (
        SELECT CASE WHEN hi = lo THEN 0 ELSE
                 least(${bins - 1}, greatest(0,
                   CAST(floor((v - lo) / ((hi - lo) / ${bins}.0))
                     AS BIGINT))) END AS bin,
               is_base
        FROM t, r),
      c AS (
        SELECT bin,
               SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS n_base,
               SUM(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS n_cur
        FROM b GROUP BY 1),
      g AS (SELECT CAST(i AS BIGINT) AS bin
            FROM unnest(generate_series(0, ${bins - 1})) s(i)),
      tot AS (SELECT CAST(SUM(n_base) AS BIGINT) AS tb,
                     CAST(SUM(n_cur) AS BIGINT) AS tc FROM c),
      f AS (
        SELECT g.bin, CAST(COALESCE(n_base, 0) AS BIGINT) AS n_base,
               CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur
        FROM g LEFT JOIN c ON c.bin = g.bin)"""

  val q193 = Qry(
    "q193_hist_drift",
    (s: SparkSession, d: String) =>
      Drift.histDrift(
          Tables.events(s, d)
            .filter(col("event_type").isin("view", "purchase")),
          col("value"), col("event_type") === "view", Bins)
        .orderBy(col("bin")),
    Some(s"""${binCountsSql(Bins)},
      pq AS (
        SELECT bin, n_base, n_cur,
               CAST(${Drift.mulDivPpbSql("n_base + 1", s"tb + $Bins")}
                 AS BIGINT) AS p_ppb,
               CAST(${Drift.mulDivPpbSql("n_cur + 1", s"tc + $Bins")}
                 AS BIGINT) AS q_ppb
        FROM f, tot)
      SELECT bin, n_base, n_cur, p_ppb, q_ppb,
             CAST(abs(p_ppb - q_ppb) // 2 AS BIGINT) AS tv_ppb,
             CAST(((q_ppb - p_ppb) * (q_ppb - p_ppb)) // p_ppb
               AS BIGINT) AS chi_ppb
      FROM pq ORDER BY bin"""))

  /** q200 — binned Kolmogorov-Smirnov drift ([[Drift.ksBins]]) over
    * the same view/purchase split as q193 at 16 bins: per-bin
    * cumulative shares in integer ppb, their absolute difference,
    * and a summary row (bin 99) carrying the KS statistic (max
    * d_ppb). KS catches the location shift that per-bin smoothing
    * dilutes. */
  val q200 = Qry(
    "q200_ks_drift",
    (s: SparkSession, d: String) => {
      val bins = Drift.ksBins(
        Tables.events(s, d)
          .filter(col("event_type").isin("view", "purchase")),
        col("value"), col("event_type") === "view", 16)
      bins.unionByName(
          bins.agg(max(col("d_ppb")).as("d_ppb"))
            .select(lit(99L).as("bin"), lit(0L).as("n_base"),
              lit(0L).as("n_cur"), lit(0L).as("cum_base"),
              lit(0L).as("cum_cur"), col("d_ppb")))
        .orderBy(col("bin"))
    },
    Some(s"""${binCountsSql(16)},
      cum AS (
        SELECT bin, n_base, n_cur,
               CAST(SUM(n_base) OVER (ORDER BY bin) AS BIGINT)
                 AS cum_base,
               CAST(SUM(n_cur) OVER (ORDER BY bin) AS BIGINT)
                 AS cum_cur
        FROM f),
      rows_ AS (
        SELECT bin, n_base, n_cur, cum_base, cum_cur,
               CAST(abs(${Drift.mulDivPpbSql("cum_base", "tb")}
                 - ${Drift.mulDivPpbSql("cum_cur", "tc")})
                 AS BIGINT) AS d_ppb
        FROM cum, tot)
      SELECT * FROM (
        SELECT * FROM rows_
        UNION ALL
        SELECT CAST(99 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT), MAX(d_ppb) FROM rows_)
      ORDER BY bin"""))

  /** q230 — embedding-centroid drift ([[Drift
    * .embeddingCentroidDrift]]): per label, the exact-integer
    * squared L2 between the even-vec_id (baseline) and odd-vec_id
    * (candidate) centroids — the embedding-space member of the
    * drift family (q193/q200 watch scalar histograms; this watches
    * WHERE the text embeds). Micro-snap → cross-multiplied
    * comparison → DECIMAL(38,0) sum → one integral divide; the
    * oracle replays every step in HUGEINT, so a single component's
    * rounding or a lost dimension breaks the hash. */
  val q230 = Qry(
    "q230_embedding_drift",
    (s: SparkSession, d: String) =>
      Drift.embeddingCentroidDrift(
          Tables.embeddings(s, d), "label", "embedding",
          inBaseline = col("vec_id") % 2 === 0)
        .orderBy(col("label")),
    Some("""
      WITH m AS (
        SELECT label, vec_id % 2 = 0 AS a, j,
               CAST(FLOOR(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
                 AS v
        FROM (SELECT label, vec_id,
                unnest(embedding) AS x,
                unnest(generate_series(1, len(embedding))) AS j
              FROM embeddings)),
      perdim AS (
        SELECT label, j,
               SUM(CASE WHEN a THEN v ELSE 0 END) AS sA,
               SUM(CASE WHEN NOT a THEN v ELSE 0 END) AS sB,
               SUM(CASE WHEN a THEN 1 ELSE 0 END) AS cA,
               SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS cB
        FROM m GROUP BY 1, 2),
      terms AS (
        SELECT label, cA, cB, (sA * cB - sB * cA) AS t
        FROM perdim WHERE cA > 0 AND cB > 0),
      agg AS (
        SELECT label, cA, cB, SUM(t * t) AS num
        FROM terms GROUP BY 1, 2, 3)
      SELECT label, CAST(cA AS BIGINT) AS c_base,
             CAST(cB AS BIGINT) AS c_cand,
             CAST(num // ((cA * cB) * (cA * cB)) AS BIGINT)
               AS drift_pico
      FROM agg ORDER BY label"""))

  val all: Seq[Qry] = Seq(q193, q200, q230)
}
