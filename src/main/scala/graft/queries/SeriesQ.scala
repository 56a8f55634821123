package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.Intervals
import Q._

/** Event-sequence analytics: interval algebra, recursive time-series
  * smoothing, and transition mining — per-key ordered-scan operators
  * that complement the window/sessionize surface (q35-q38, q72, q78,
  * q80). All three are deterministic integer arithmetic end to end.
  */
object SeriesQ {

  /** Merged activity intervals (q105): each event opens a 30-minute
    * [t, t+1800s) presence span; overlapping/touching spans per user
    * coalesce into maximal intervals ([[Intervals.merge]]), then roll
    * up to per-user dwell stats. The classic union-of-intervals
    * operator (coverage windows, downtime stitching).
    *
    * Scale shape: every window/groupBy partitions on user_id — one
    * key shuffle, per-key sorts, no global ordering; integer epoch
    * seconds only. */
  val q105 = Qry(
    "q105_interval_merge",
    (s: SparkSession, d: String) => {
      val iv = Tables.events(s, d)
        .filter(col("user_id") < 200)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts) div 1000000").as("s0"))
        .withColumn("e0", col("s0") + lit(1800L))
      Intervals.merge(iv, "user_id", "s0", "e0", "event_id")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_intervals"),
          sum(col("m_end") - col("m_start")).as("covered_sec"),
          max(col("m_end") - col("m_start")).as("longest_sec"),
          sum(col("n_source")).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS s0,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 + 1800 AS e0
        FROM events WHERE user_id < 200),
      flagged AS (
        SELECT user_id, event_id, s0, e0,
               CASE WHEN MAX(e0) OVER (
                      PARTITION BY user_id ORDER BY s0, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                 OR s0 > MAX(e0) OVER (
                      PARTITION BY user_id ORDER BY s0, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_grp
        FROM iv),
      labeled AS (
        SELECT user_id, s0, e0,
               SUM(new_grp) OVER (
                 PARTITION BY user_id ORDER BY s0, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM flagged),
      merged AS (
        SELECT user_id, grp, MIN(s0) AS m_start, MAX(e0) AS m_end,
               COUNT(*) AS n_source
        FROM labeled GROUP BY user_id, grp)
      SELECT user_id,
             COUNT(*) AS n_intervals,
             CAST(SUM(m_end - m_start) AS BIGINT) AS covered_sec,
             MAX(m_end - m_start) AS longest_sec,
             CAST(SUM(n_source) AS BIGINT) AS n_events
      FROM merged GROUP BY user_id ORDER BY user_id"""))

  /** Fixed-point exponential moving average (q107): per-user EMA of
    * event values with α = 0.3, the inherently-sequential recursion
    * r ← (3·v + 7·r) div 10 run in integer MILLI-CENTS (value snapped
    * to its cent grid, ×1000 for headroom through the divisions) —
    * zero float ops, so the fold is bit-identical across engines.
    *
    * Scale shape: EMA is a per-key sequential scan by definition;
    * parallelism comes from the key partitioning (one shuffle), and
    * each key's ordered fold runs as a single array aggregate —
    * valid while per-key series fit an executor (bounded here;
    * at unbounded history, segment the fold by time range and carry
    * the previous segment's tail as the next segment's seed, exact
    * because the recursion's dependence on the seed is associative
    * composition of affine maps). */
  val q107 = Qry(
    "q107_ema_fixedpoint",
    (s: SparkSession, d: String) => {
      val src = Tables.events(s, d)
        .filter(col("user_id") < 100)
        .select(col("user_id"),
          struct(
            unix_micros(col("ts")).as("t"),
            col("event_id").as("eid"),
            (expr("CAST(floor(value * 100 + 0.5) AS BIGINT)") * lit(1000L))
              .as("v")).as("p"))
      src.groupBy(col("user_id"))
        .agg(sort_array(collect_list(col("p"))).as("arr"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"),
          expr("""aggregate(
                    slice(arr, 2, size(arr) - 1),
                    element_at(arr, 1).v,
                    (acc, x) -> (3 * x.v + 7 * acc) div 10)""")
            .as("ema_milli"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH src AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t,
               event_id AS eid,
               CAST(floor(value * 100 + 0.5) AS BIGINT) * 1000 AS v
        FROM events WHERE user_id < 100),
      lists AS (
        SELECT user_id, COUNT(*) AS n_events,
               list(v ORDER BY t, eid, v) AS vs
        FROM src GROUP BY user_id)
      SELECT user_id, n_events,
             list_reduce(vs, (acc, x) -> (3 * x + 7 * acc) // 10)
               AS ema_milli
      FROM lists ORDER BY user_id"""))

  /** Event-type transition matrix (q109): per-user next-event via
    * lead() on the (ts, event_id) order, then global (from, to)
    * transition counts and shares — first-order Markov structure
    * mining over clickstream-shaped data.
    *
    * Scale shape: lead() partitions on user_id (one key shuffle);
    * the share window runs over the |types|² aggregated matrix, not
    * the input. Share division is the identical IEEE op sequence on
    * both engines, then tie-proof r6 snapping. */
  val q109 = Qry(
    "q109_transitions",
    (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val m = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      m.withColumn("share",
          r6(col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy(lit(1)))
              .cast("double")))
        .orderBy(col("event_type"), col("next_type"))
    },
    Some(s"""
      WITH nxt AS (
        SELECT event_type,
               LEAD(event_type) OVER (
                 PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
        FROM events),
      m AS (
        SELECT event_type, next_type, COUNT(*) AS n
        FROM nxt WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type)
      SELECT event_type, next_type, n,
             ${r6Sql("CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)")}
               AS share
      FROM m ORDER BY event_type, next_type"""))

  /** Rolling anomaly flags with ZERO float ops (q160): each event is
    * scored against the 20 events before it (per user, event-time
    * order) — flagged when its deviation from the rolling mean
    * exceeds 3 rolling standard deviations. The entire test runs in
    * integer algebra on cent-snapped values: (v·n − s)² > 9·(n·q − s²)
    * is (v − μ)² > 9σ² multiplied through by n², with s/q the rolling
    * sum and sum-of-squares — no sqrt, no division, no float, so the
    * flags are bit-identical on any engine and any partitioning.
    * Windows shorter than 10 events are not scored (cold start).
    * The quadratic algebra runs in DECIMAL(38,0) (oracle: HUGEINT):
    * v² and the closing products are quadratic in the value domain,
    * so int64 silently lacks headroom once values scale — decimal
    * turns overflow into a loud NULL instead (q245 Gini rule).
    *
    * Scale shape: one user-key exchange; the rolling frame is a
    * per-key sorted ROWS window (bounded 20-row state per row); the
    * rollup reuses the same partitioning. */
  val q160 = Qry(
    "q160_rolling_anomaly",
    (s: SparkSession, d: String) => {
      val src = Tables.events(s, d)
        .filter(col("user_id") < 200)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
        .rowsBetween(-20, -1)
      // all quadratic algebra in DECIMAL(38,0): v² per row and the
      // (v·n−s)² / 9(nq−s²) closing products are quadratic in the
      // value domain, so a 1e6-scaled domain silently needs ~2×
      // int64 width — decimal makes overflow a loud NULL and matches
      // the oracle's HUGEINT (the q245 Gini rule; caught by the
      // full-registry hostile-cell fuzz gate)
      def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val scored = src
        .select(col("*"),
          count(lit(1)).over(w).as("n"),
          coalesce(sum(d38(col("v"))).over(w),
            lit(0L).cast("decimal(38,0)")).as("s"),
          coalesce(sum(d38(col("v")) * col("v")).over(w),
            lit(0L).cast("decimal(38,0)")).as("q"))
        .withColumn("scored", col("n") >= 10)
        .withColumn("anom",
          col("scored") &&
            (d38(col("v")) * col("n") - col("s")) *
              (d38(col("v")) * col("n") - col("s")) >
            lit(9L) * (d38(col("n")) * col("q") - col("s") * col("s")))
      scored.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("scored"), 1L).otherwise(0L)).as("n_scored"),
          sum(when(col("anom"), 1L).otherwise(0L)).as("n_anomalies"),
          coalesce(min(when(col("anom"), col("event_id"))), lit(-1L))
            .as("first_anomaly"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH src AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events WHERE user_id < 200),
      roll AS (
        SELECT user_id, event_id, v,
               CAST(COUNT(*) OVER w AS HUGEINT) AS n,
               CAST(COALESCE(SUM(CAST(v AS HUGEINT)) OVER w, 0)
                 AS HUGEINT) AS s,
               CAST(COALESCE(SUM(CAST(v AS HUGEINT) * v) OVER w, 0)
                 AS HUGEINT) AS q
        FROM src
        WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      flagged AS (
        SELECT user_id, event_id,
               n >= 10 AS scored,
               n >= 10 AND
                 (v * n - s) * (v * n - s) > 9 * (n * q - s * s)
                 AS anom
        FROM roll)
      SELECT user_id, COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN scored THEN 1 ELSE 0 END) AS BIGINT)
               AS n_scored,
             CAST(SUM(CASE WHEN anom THEN 1 ELSE 0 END) AS BIGINT)
               AS n_anomalies,
             COALESCE(MIN(CASE WHEN anom THEN event_id END), -1)
               AS first_anomaly
      FROM flagged GROUP BY user_id ORDER BY user_id"""))

  /** q169 — OHLC bars: per (event_type, day) candle — open/close by
    * event-time order via `min_by`/`max_by` over a (t, event_id)
    * struct (partial-aggregable — no window, no per-key sort; ties
    * impossible on the unique tiebreak), high/low/volume/turnover as
    * plain aggregates on cent-snapped integers. The downsampling
    * primitive time-series stores call candles/bars.
    *
    * Scale shape: ONE partial-aggregable shuffle on the (type, day)
    * composite — every map task emits one candle per key, so a 100 TB
    * tick stream reduces to |types|·|days| rows without any ordered
    * repartition. */
  val q169 = Qry(
    "q169_ohlc_bars",
    (s: SparkSession, d: String) =>
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("t"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          floor(col("value") * 100 + lit(0.5)).cast("long")
            .as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(
          min_by(col("cents"), struct(col("t"), col("event_id")))
            .as("open"),
          max(col("cents")).as("high"),
          min(col("cents")).as("low"),
          max_by(col("cents"), struct(col("t"), col("event_id")))
            .as("close"),
          count(lit(1)).as("n_trades"),
          sum(col("cents")).as("sum_cents"))
        .orderBy(col("event_type"), col("day")),
    Some("""
      WITH src AS (
        SELECT event_type, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events)
      SELECT event_type, day,
             FIRST(cents ORDER BY t, event_id) AS open,
             MAX(cents) AS high, MIN(cents) AS low,
             LAST(cents ORDER BY t, event_id) AS close,
             COUNT(*) AS n_trades,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM src GROUP BY event_type, day
      ORDER BY event_type, day"""))

  val all: Seq[Qry] = Seq(q105, q107, q109, q160, q169)
}
