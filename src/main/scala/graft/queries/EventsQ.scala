package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.Sessionize
import Q._

/** Event-time windowing in batch form (SURVEY.md §2.B G12): tumbling
  * and sliding windows, gap-based sessionization, and keyed
  * window-scoped dedup. These share semantics with the Structured
  * Streaming surface in [[graft.streaming.StreamOps]] (same window
  * assignment, same session gap rule); the streaming side is
  * verified by ScalaTest with MemoryStream since DuckDB can't run a
  * state store, these batch twins ARE DuckDB-verified.
  */
object EventsQ {

  /** Tumbling 1-day event-time windows × event type (G12):
    * window(ts, '1 day') assigns each event to exactly one bucket —
    * partial agg before the single shuffle. */
  val q35 = Qry(
    "q35_window_tumbling",
    (s: SparkSession, d: String) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("day"), col("event_type")),
    Some(s"""
      SELECT STRFTIME(date_trunc('day', CAST(ts AS TIMESTAMP)),
               '%Y-%m-%d') AS day,
             event_type, COUNT(*) AS n,
             ${dsumSql("value", 2)} AS sum_value
      FROM events
      GROUP BY 1, 2 ORDER BY day, event_type"""))

  /** Sliding 1-hour windows every 30 minutes (G12): each event lands
    * in exactly 2 windows; the oracle reproduces Spark's window
    * assignment arithmetic from epoch seconds. */
  val q36 = Qry(
    "q36_window_sliding",
    (s: SparkSession, d: String) =>
      Tables.events(s, d)
        .filter(col("user_id") < 3)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("w_start"),
          col("n"), col("sum_value"))
        .orderBy(col("w_start")),
    Some(s"""
      WITH assigned AS (
        SELECT make_timestamp(
                 ((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
                   // 1800 * 1800 - off) * 1000000) AS w_start,
               value
        FROM events, unnest([0, 1800]) AS t(off)
        WHERE user_id < 3)
      SELECT STRFTIME(w_start, '%Y-%m-%d %H:%M') AS w_start,
             COUNT(*) AS n, ${dsumSql("value", 2)} AS sum_value
      FROM assigned
      GROUP BY 1 ORDER BY w_start"""))

  /** Gap-based sessionization (G12 batch form) via
    * [[graft.operators.Sessionize]]: 6-hour inactivity gap, per-user
    * 0-based session ids, session duration + event count. */
  val q37 = Qry(
    "q37_sessionize",
    (s: SparkSession, d: String) =>
      Sessionize.sessionStats(
          Tables.events(s, d).select(col("user_id"), col("ts")),
          "user_id", "ts", gapSec = 21600L)
        .select(col("user_id"), col("session_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss")
            .as("start_s"),
          col("duration_sec"), col("n_events"))
        .orderBy(col("user_id"), col("session_id")),
    Some("""
      WITH flagged AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                      - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                        OVER (PARTITION BY user_id ORDER BY
                              CAST(ts AS TIMESTAMP))
                      > CAST(21600 AS BIGINT) * 1000000 THEN 1
                    WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)))
                        OVER (PARTITION BY user_id ORDER BY
                              CAST(ts AS TIMESTAMP)) IS NULL THEN 1
                    ELSE 0 END AS new_session
        FROM events),
      sess AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) - 1 AS session_id
        FROM flagged)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
               AS duration_sec,
             COUNT(*) AS n_events
      FROM sess
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  /** Keyed window-scoped dedup (G12/A1): first event per
    * (user, event_type, 1-day window) — the batch twin of streaming
    * `dropDuplicatesWithinWatermark`. */
  val q38 = Qry(
    "q38_window_dedup",
    (s: SparkSession, d: String) => {
      val w = Window
        .partitionBy(col("user_id"), col("event_type"), col("day"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_first_events"),
          dsum(col("value"), 2).as("sum_first_value"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type,
                              date_trunc('day', CAST(ts AS TIMESTAMP))
                 ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events)
      SELECT event_type, COUNT(*) AS n_first_events,
             ${dsumSql("value", 2)} AS sum_first_value
      FROM ranked WHERE rn = 1
      GROUP BY event_type ORDER BY event_type"""))

  /** Time-series gap-fill + forward-fill (the resampling operator
    * every metrics pipeline needs): per user, an hourly spine is
    * generated between the user's first and last event hour
    * (`sequence` + explode — distributed, no driver loop), actuals
    * left-joined on, and missing hours carry the last seen value
    * forward via last(_, ignoreNulls) over an unbounded-preceding
    * frame. One shuffle for the per-hour agg, one window pass. */
  val q72 = Qry(
    "q72_gap_fill",
    (s: SparkSession, d: String) => {
      val hourly = Tables.events(s, d)
        .filter(col("user_id") < 4)
        .groupBy(col("user_id"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
      val spine = hourly.groupBy(col("user_id"))
        .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
        .select(col("user_id"),
          explode(expr("sequence(mn, mx, interval 1 hour)")).as("bucket"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("user_id", "bucket"), "left")
        .select(col("user_id"),
          date_format(col("bucket"), "yyyy-MM-dd HH:00").as("hour"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          last(col("sum_value"), ignoreNulls = true).over(w)
            .as("filled_value"),
          col("n").isNull.as("is_gap"))
        .orderBy(col("user_id"), col("hour"))
    },
    Some(s"""
      WITH hourly AS (
        SELECT user_id,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
               COUNT(*) AS n, ${dsumSql("value", 2)} AS sum_value
        FROM events WHERE user_id < 4
        GROUP BY user_id, bucket),
      spine AS (
        SELECT user_id, unnest(generate_series(mn, mx,
                 INTERVAL 1 HOUR)) AS bucket
        FROM (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
              FROM hourly GROUP BY user_id)),
      joined AS (
        SELECT s.user_id, s.bucket, h.n, h.sum_value
        FROM spine s LEFT JOIN hourly h
          ON s.user_id = h.user_id AND s.bucket = h.bucket)
      SELECT user_id,
             strftime(bucket, '%Y-%m-%d %H:00') AS hour,
             COALESCE(n, 0) AS n_events,
             last_value(sum_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_value,
             (n IS NULL) AS is_gap
      FROM joined
      ORDER BY user_id, hour"""))

  /** q139 — time-bounded conversion funnel ([[graft.operators
    * .Journeys.funnelTimes]]): signup → click → purchase, each step
    * within 3 days of the previous step's match. Emits per-stage
    * user counts, user-id checksums, and the exact integer-second
    * total delay from the stage-1 anchor — a genuine drop-off
    * funnel on this corpus (150 → 128 → 89 users at sf0.01).
    * All time arithmetic in integer microseconds. */
  val q139 = Qry(
    "q139_conversion_funnel",
    (s: SparkSession, d: String) => {
      val stages = graft.operators.Journeys.funnelTimes(
        Tables.events(s, d), "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"), windowSec = 259200L)
      val anchor = stages.filter(col("stage") === 1L)
        .select(col("user_id").as("__u"), unix_micros(col("t")).as("t1"))
      stages.join(anchor, col("user_id") === col("__u"))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("user_id")).as("id_checksum"),
          sum(expr("(unix_micros(t) - t1) div 1000000"))
            .as("sum_delay_sec"))
        .select(col("stage"),
          element_at(lit(Array("signup", "click", "purchase")),
            col("stage").cast("int")).as("step"),
          col("n_users"), col("id_checksum"), col("sum_delay_sec"))
        .orderBy(col("stage"))
    },
    Some("""
      WITH s1 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(CAST(e.ts AS TIMESTAMP))
              > epoch_us(CAST(s1.t AS TIMESTAMP))
          AND epoch_us(CAST(e.ts AS TIMESTAMP))
              <= epoch_us(CAST(s1.t AS TIMESTAMP)) + 259200000000
        GROUP BY e.user_id),
      s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(CAST(e.ts AS TIMESTAMP))
              > epoch_us(CAST(s2.t AS TIMESTAMP))
          AND epoch_us(CAST(e.ts AS TIMESTAMP))
              <= epoch_us(CAST(s2.t AS TIMESTAMP)) + 259200000000
        GROUP BY e.user_id),
      stages AS (
        SELECT user_id, 1 AS stage, t FROM s1
        UNION ALL SELECT user_id, 2, t FROM s2
        UNION ALL SELECT user_id, 3, t FROM s3)
      SELECT st.stage,
             CASE st.stage WHEN 1 THEN 'signup' WHEN 2 THEN 'click'
                           ELSE 'purchase' END AS step,
             COUNT(*) AS n_users,
             CAST(SUM(st.user_id) AS BIGINT) AS id_checksum,
             CAST(SUM((epoch_us(CAST(st.t AS TIMESTAMP))
               - epoch_us(CAST(s1.t AS TIMESTAMP))) // 1000000)
               AS BIGINT) AS sum_delay_sec
      FROM stages st JOIN s1 ON st.user_id = s1.user_id
      GROUP BY st.stage ORDER BY st.stage"""))

  /** q140 — frequent event paths ([[graft.operators.Journeys
    * .topPaths]]): each user's full type sequence (ts order, event-id
    * tiebreak) 3-grammed map-side, global path counts, top-10 with
    * full deterministic tiebreak — clickstream path mining, the
    * sequence generalization of q109's single transition matrix. */
  val q140 = Qry(
    "q140_event_paths",
    (s: SparkSession, d: String) =>
      graft.operators.Journeys.topPaths(
        Tables.events(s, d), "user_id", "event_type", "ts",
        tiebreakCol = "event_id", n = 3, k = 10),
    Some("""
      WITH seqs AS (
        SELECT list(event_type ORDER BY ts, event_id) AS types
        FROM events GROUP BY user_id),
      g AS (
        SELECT unnest(list_transform(
                 list_filter(list_zip(types, types[2:], types[3:]),
                   p -> p[3] IS NOT NULL),
                 p -> p[1] || chr(31) || p[2] || chr(31) || p[3]))
               AS gram
        FROM seqs),
      top AS (
        SELECT gram, COUNT(*) AS n FROM g GROUP BY gram
        ORDER BY n DESC, gram LIMIT 10)
      SELECT replace(gram, chr(31), '>') AS path, n FROM top
      ORDER BY n DESC, gram"""))

  /** q148 — sessionized frequent paths ([[graft.operators.Journeys
    * .topPathsSessionized]]): q140's path mining with the 100 TB
    * state bound made real — events are gap-sessionized (q37's
    * 6-hour contract) and sequences keyed by (user, session), so the
    * largest collected list is one session and no 3-gram spans an
    * inactivity gap. The oracle replays session assignment (lag →
    * boundary flag → running sum) AND the per-session gram counting,
    * so both the boundary semantics and the path algebra gate. */
  val q148 = Qry(
    "q148_session_paths",
    (s: SparkSession, d: String) =>
      graft.operators.Journeys.topPathsSessionized(
        Tables.events(s, d), "user_id", "event_type", "ts",
        tiebreakCol = "event_id", gapSec = 21600L, n = 3, k = 10),
    Some("""
      WITH flagged AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               event_id,
               CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)))
                        OVER (PARTITION BY user_id ORDER BY
                              CAST(ts AS TIMESTAMP)) IS NULL THEN 1
                    WHEN epoch_us(CAST(ts AS TIMESTAMP))
                      - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                        OVER (PARTITION BY user_id ORDER BY
                              CAST(ts AS TIMESTAMP))
                      > CAST(21600 AS BIGINT) * 1000000 THEN 1
                    ELSE 0 END AS new_session
        FROM events),
      sess AS (
        SELECT user_id, event_type, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) - 1 AS session_id
        FROM flagged),
      seqs AS (
        SELECT list(event_type ORDER BY ts, event_id) AS types
        FROM sess GROUP BY user_id, session_id),
      g AS (
        SELECT unnest(list_transform(
                 list_filter(list_zip(types, types[2:], types[3:]),
                   p -> p[3] IS NOT NULL),
                 p -> p[1] || chr(31) || p[2] || chr(31) || p[3]))
               AS gram
        FROM seqs),
      top AS (
        SELECT gram, COUNT(*) AS n FROM g GROUP BY gram
        ORDER BY n DESC, gram LIMIT 10)
      SELECT replace(gram, chr(31), '>') AS path, n FROM top
      ORDER BY n DESC, gram"""))

  /** q172 — rolling active users: DAU, trailing-7-day WAU, and the
    * DAU/WAU stickiness ratio per day. WAU is EXACT sliding distinct
    * without re-scanning events per window: events collapse once to
    * distinct (day, user) pairs, each pair fans out to the ≤ 7
    * window-end days it supports (map-side `explode(sequence)` on
    * date arithmetic), and one distinct-aggregate per window-day
    * closes it. Work is bounded by active-pairs × 7, never
    * events × 7.
    *
    * Scale shape: one (day,user) distinct shuffle + one windowed
    * distinct — both partial-aggregable; no self-join of the event
    * stream against itself. Window-end days outside the observed
    * range drop via the inner join on real days. */
  val q172 = Qry(
    "q172_rolling_active_users",
    (s: SparkSession, d: String) => {
      val du = Tables.events(s, d)
        .select(col("user_id"),
          to_date(col("ts")).as("day")).distinct()
      val days = du.select(col("day")).distinct()
      val dau = du.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = du
        .select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))"))
            .as("wday"))
        .join(days.select(col("day").as("wday")), Seq("wday"))
        .groupBy(col("wday"))
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, dau("day") === wau("wday"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"),
          r6(col("dau").cast("double") / col("wau").cast("double"))
            .as("stickiness"))
        .orderBy(col("day"))
    },
    Some(s"""
      WITH du AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events),
      days AS (SELECT DISTINCT day FROM du),
      dau AS (
        SELECT day, COUNT(DISTINCT user_id) AS dau
        FROM du GROUP BY day),
      fan AS (
        SELECT du.user_id, du.day + CAST(k AS INTEGER) AS wday
        FROM du, unnest(generate_series(0, 6)) AS t(k)),
      wau AS (
        SELECT f.wday, COUNT(DISTINCT f.user_id) AS wau
        FROM fan f JOIN days dd ON dd.day = f.wday
        GROUP BY f.wday)
      SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
             ${r6Sql("CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE)")}
               AS stickiness
      FROM dau d JOIN wau w ON w.wday = d.day
      ORDER BY day"""))

  /** q221 — declarative row-pattern matching ([[graft.operators
    * .Journeys.matchRecognize]], the MATCH_RECOGNIZE shape):
    * every non-overlapping contiguous `view click+` run (a view
    * followed by an unbroken click burst) inside a 6-hour session,
    * AFTER MATCH SKIP PAST LAST ROW. The
    * imperative funnel (q139) allows gaps between steps; this is the
    * strict-adjacency complement, the form a warehouse user types.
    * The oracle replays session assignment (q148's lag → flag →
    * running sum) AND the identical regex scan in DuckDB's RE2, so
    * boundary semantics, contiguity, greed, and the skip policy all
    * gate — a match crossing a session boundary or overlapping its
    * predecessor breaks the hash. */
  val q221 = Qry(
    "q221_match_recognize",
    (s: SparkSession, d: String) =>
      graft.operators.Journeys.matchRecognize(
        Tables.events(s, d), "user_id", "ts", "event_id",
        "event_type", pattern = "view click+",
        gapSec = 21600L)
        .orderBy(col("user_id"), col("session_id"), col("match_no")),
    Some("""
      WITH flagged AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               event_id,
               CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)))
                        OVER (PARTITION BY user_id ORDER BY
                              CAST(ts AS TIMESTAMP)) IS NULL THEN 1
                    WHEN epoch_us(CAST(ts AS TIMESTAMP))
                      - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                        OVER (PARTITION BY user_id ORDER BY
                              CAST(ts AS TIMESTAMP))
                      > CAST(21600 AS BIGINT) * 1000000 THEN 1
                    ELSE 0 END AS new_session
        FROM events),
      sess AS (
        SELECT user_id, event_type, ts, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id
                 ORDER BY ts ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
                 AS session_id
        FROM flagged),
      seqs AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY ts, event_id)
                 || '>' AS str
        FROM sess GROUP BY user_id, session_id),
      m AS (
        SELECT user_id, session_id,
               regexp_extract_all(str,
                 '(?:view>)(?:click>)+') AS l
        FROM seqs),
      x AS (
        SELECT user_id, session_id,
               unnest(l) AS mm,
               unnest(generate_series(1, len(l))) AS match_no
        FROM m)
      SELECT user_id, session_id, CAST(match_no AS BIGINT) AS match_no,
             rtrim(mm, '>') AS match_path,
             CAST(length(mm) - length(replace(mm, '>', ''))
               AS BIGINT) AS match_len
      FROM x
      ORDER BY user_id, session_id, match_no"""))

  val all: Seq[Qry] =
    Seq(q35, q36, q37, q38, q72, q139, q140, q148, q172, q221)
}
