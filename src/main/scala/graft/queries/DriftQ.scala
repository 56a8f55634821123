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
  */
object DriftQ {

  private val Bins = 8

  val q193 = Qry(
    "q193_hist_drift",
    (s: SparkSession, d: String) =>
      Drift.histDrift(
          Tables.events(s, d)
            .filter(col("event_type").isin("view", "purchase")),
          col("value"), col("event_type") === "view", Bins)
        .orderBy(col("bin")),
    Some(s"""
      WITH t AS (
        SELECT value AS v, event_type = 'view' AS is_base
        FROM events WHERE event_type IN ('view', 'purchase')),
      r AS (SELECT min(v) AS lo, max(v) AS hi FROM t WHERE is_base),
      b AS (
        SELECT CASE WHEN hi = lo THEN 0 ELSE
                 least(${Bins - 1}, greatest(0,
                   CAST(floor((v - lo) / ((hi - lo) / ${Bins}.0))
                     AS BIGINT))) END AS bin,
               is_base
        FROM t, r),
      c AS (
        SELECT bin,
               SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS n_base,
               SUM(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS n_cur
        FROM b GROUP BY 1),
      g AS (SELECT CAST(i AS BIGINT) AS bin
            FROM unnest(generate_series(0, ${Bins - 1})) s(i)),
      tot AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM c),
      f AS (
        SELECT g.bin, COALESCE(n_base, 0) AS n_base,
               COALESCE(n_cur, 0) AS n_cur
        FROM g LEFT JOIN c ON c.bin = g.bin),
      pq AS (
        SELECT bin, n_base, n_cur,
               CAST(n_base + 1 AS DOUBLE) / CAST(tb + $Bins AS DOUBLE)
                 AS p,
               CAST(n_cur + 1 AS DOUBLE) / CAST(tc + $Bins AS DOUBLE)
                 AS q
        FROM f, tot)
      SELECT bin, n_base, n_cur,
             CAST(floor(p * 1e6) AS BIGINT) AS p_micro,
             CAST(floor(q * 1e6) AS BIGINT) AS q_micro,
             ${Q.r6Sql("abs(p - q) / 2.0")} AS tv_c,
             ${Q.r6Sql("(q - p) * (q - p) / p")} AS chi_c
      FROM pq ORDER BY bin"""))

  /** q200 — binned Kolmogorov-Smirnov drift ([[Drift.ksBins]]) over
    * the same view/purchase split as q193 at 16 bins: per-bin
    * cumulative shares, their r6-snapped absolute difference, and a
    * summary row (bin 99) carrying the KS statistic (max d). KS
    * catches the location shift that per-bin smoothing dilutes. */
  val q200 = Qry(
    "q200_ks_drift",
    (s: SparkSession, d: String) => {
      val bins = Drift.ksBins(
        Tables.events(s, d)
          .filter(col("event_type").isin("view", "purchase")),
        col("value"), col("event_type") === "view", 16)
      bins.unionByName(
          bins.agg(max(col("d")).as("d"))
            .select(lit(99L).as("bin"), lit(0L).as("n_base"),
              lit(0L).as("n_cur"), lit(0L).as("cum_base"),
              lit(0L).as("cum_cur"), col("d")))
        .orderBy(col("bin"))
    },
    Some(s"""
      WITH t AS (
        SELECT value AS v, event_type = 'view' AS is_base
        FROM events WHERE event_type IN ('view', 'purchase')),
      r AS (SELECT min(v) AS lo, max(v) AS hi FROM t WHERE is_base),
      b AS (
        SELECT CASE WHEN hi = lo THEN 0 ELSE
                 least(15, greatest(0,
                   CAST(floor((v - lo) / ((hi - lo) / 16.0))
                     AS BIGINT))) END AS bin,
               is_base
        FROM t, r),
      c AS (
        SELECT bin,
               SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS n_base,
               SUM(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS n_cur
        FROM b GROUP BY 1),
      g AS (SELECT CAST(i AS BIGINT) AS bin
            FROM unnest(generate_series(0, 15)) s(i)),
      tot AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM c),
      f AS (
        SELECT g.bin, COALESCE(n_base, 0) AS n_base,
               COALESCE(n_cur, 0) AS n_cur
        FROM g LEFT JOIN c ON c.bin = g.bin),
      cum AS (
        SELECT bin, n_base, n_cur,
               SUM(n_base) OVER (ORDER BY bin) AS cum_base,
               SUM(n_cur) OVER (ORDER BY bin) AS cum_cur
        FROM f),
      rows_ AS (
        SELECT bin, n_base, n_cur, cum_base, cum_cur,
               ${Q.r6Sql("abs(CAST(cum_base AS DOUBLE) / tb" +
                 " - CAST(cum_cur AS DOUBLE) / tc)")} AS d
        FROM cum, tot)
      SELECT * FROM (
        SELECT * FROM rows_
        UNION ALL
        SELECT 99, 0, 0, 0, 0, MAX(d) FROM rows_)
      ORDER BY bin"""))

  val all: Seq[Qry] = Seq(q193, q200)
}
