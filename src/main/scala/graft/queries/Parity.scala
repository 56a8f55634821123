package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.Metlink
import Q._

/** Reference-parity queries (SURVEY.md §2.A): the complete task.ts
  * pipeline driven end-to-end through [[graft.operators.Metlink]].
  *
  * The GTFS-RT feed is synthesized deterministically from `events`
  * (driver testdata is the only sanctioned input), arranged to hit
  * every branch: all three vehicle classes incl. the `MIF` route
  * rule, (0,0) coordinate drop, empty trip_id drop, falsy-zero
  * speed/bearing → NaN, absent speed/occupancy, occupancy=7 →
  * 'Unknown' fallback, and multi-event vehicles exercising the
  * last-wins dedup. The DuckDB oracle re-derives the same feature
  * rows with SQL CASE/printf/window logic.
  */
object Parity {

  /** Deterministic GTFS-RT-shaped entity frame from `events`:
    * user_id → vehicle, event_type → trip prefix (ship/train/bus/
    * ferry-route/invalid), json k → occupancy & degenerate cases. */
  private def synthFeed(s: SparkSession, d: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, d)
      .filter(col("event_id") < 2000)
      .select(
        col("event_id").as("seq"),
        concat(lit("ent-"), col("event_id")).as("id"),
        struct(
          struct(
            when(col("event_type") === "signup",
                concat(lit("QDF__"), k))
              .when(col("event_type") === "error",
                concat(lit("HVL__"), k))
              .when(col("event_type") === "view",
                concat(lit("MIF__"), k))
              .when(col("event_type") === "click", lit(""))
              .otherwise(concat(k, lit("__20240115__x")))
              .as("trip_id"),
            k.as("route_id"),
            (k % 2).as("direction_id"),
            lit("07:30:00").as("start_time"),
            lit("20240115").as("start_date"),
            lit(0L).as("schedule_relationship")).as("trip"),
          struct(
            when(k % 17 === 0, lit(0d))
              .otherwise(round(lit(-41d) - col("value") / 1000d, 6))
              .as("latitude"),
            when(k % 17 === 0, lit(0d))
              .otherwise(round(lit(174d) + col("value") / 1000d, 6))
              .as("longitude"),
            when(k % 5 === 0, lit(0d))
              .otherwise(round(k * 3.7d, 1)).as("bearing"),
            when(k % 3 === 0, lit(null).cast("double"))
              .when(k % 7 === 0, lit(0d))
              .otherwise(floor(col("value")) / 10d).as("speed"))
            .as("position"),
          unix_micros(col("ts")).divide(1000000L).cast("long")
            .as("timestamp"),
          struct(concat(lit("veh-"), col("user_id")).as("id"))
            .as("vehicle"),
          when(k % 11 === 0, lit(null).cast("long"))
            .otherwise(k % 8).as("occupancy_status"),
          k.as("current_stop_sequence"),
          concat(lit("stop-"), k).as("stop_id"),
          lit(2L).as("current_status")).as("vehicle"))
  }

  /** Full pipeline, flattened for hashing: every property the
    * reference emits (task.ts:289-320), NaN sentinels included
    * (pandas treats NaN==NaN as equal in the compare). */
  val q39 = Qry(
    "q39_metlink_pipeline",
    (s: SparkSession, d: String) =>
      Metlink.transform(synthFeed(s, d), col("seq"))
        .select(
          col("id"),
          col("properties.type").as("cot_type"),
          col("properties.callsign").as("callsign"),
          date_format(col("properties.time"), "yyyy-MM-dd HH:mm:ss")
            .as("time_s"),
          col("properties.speed").as("speed"),
          col("properties.course").as("course"),
          col("properties.`marker-color`").as("marker_color"),
          col("properties.stale").as("stale"),
          col("properties.metadata.routeId").as("meta_route"),
          col("properties.metadata.directionId").as("meta_direction"),
          col("properties.metadata.occupancy").as("meta_occupancy"),
          col("properties.remarks").as("remarks"),
          col("properties.icon").as("icon"),
          col("geometry.coordinates").getItem(0).as("lon"),
          col("geometry.coordinates").getItem(1).as("lat"))
        .orderBy(col("id")),
    Some(s"""
      WITH src AS (
        SELECT event_id AS seq,
               CAST(json_extract(props, '$$.k') AS BIGINT) AS k,
               event_type, value, user_id,
               CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_id < 2000),
      feed AS (
        SELECT seq,
               CASE WHEN event_type = 'signup' THEN 'QDF__' || k
                    WHEN event_type = 'error' THEN 'HVL__' || k
                    WHEN event_type = 'view' THEN 'MIF__' || k
                    WHEN event_type = 'click' THEN ''
                    ELSE k || '__20240115__x' END AS trip_id,
               k % 2 AS direction_id,
               CASE WHEN k % 17 = 0 THEN 0.0
                    ELSE ROUND(-41.0 - value / 1000, 6) END AS latitude,
               CASE WHEN k % 17 = 0 THEN 0.0
                    ELSE ROUND(174.0 + value / 1000, 6) END AS longitude,
               CASE WHEN k % 5 = 0 THEN 0.0
                    ELSE ROUND(k * 3.7, 1) END AS bearing,
               CASE WHEN k % 3 = 0 THEN NULL
                    WHEN k % 7 = 0 THEN 0.0
                    ELSE FLOOR(value) / 10 END AS speed,
               epoch_us(ts) // 1000000 AS timestamp,
               'veh-' || user_id AS vehicle_id,
               CASE WHEN k % 11 = 0 THEN NULL ELSE k % 8 END
                 AS occupancy_status
        FROM src),
      classified AS (
        SELECT *,
               string_split(trip_id, '__')[1] AS route,
               CASE WHEN starts_with(trip_id, 'QDF')
                      OR string_split(trip_id, '__')[1] = 'MIF'
                    THEN 'Ship'
                    WHEN starts_with(trip_id, 'HVL')
                      OR starts_with(trip_id, 'JVL')
                      OR starts_with(trip_id, 'KPL')
                      OR starts_with(trip_id, 'MEL')
                      OR starts_with(trip_id, 'WRL')
                      OR starts_with(trip_id, 'MUL')
                    THEN 'Train' ELSE 'Bus' END AS vtype
        FROM feed
        WHERE NOT (latitude = 0 AND longitude = 0)
          AND trip_id IS NOT NULL AND trip_id <> ''),
      decoded AS (
        SELECT *,
               'WLG-Metlink' || vtype || '-' || vehicle_id AS cot_id,
               CASE vtype WHEN 'Ship' THEN 'a-f-S-E-V'
                 WHEN 'Train' THEN 'a-u-G-E-V'
                 ELSE 'a-f-G-E-V-C' END AS cot_type,
               CASE vtype WHEN 'Ship' THEN '#00FFFF'
                 WHEN 'Train' THEN '#7F007F' ELSE '#007F00' END
                 AS marker_color,
               CASE vtype
                 WHEN 'Ship' THEN
                   '34ae1613-9645-4222-a9d2-e5f243dea2865/Transportation/Ship.png'
                 WHEN 'Train' THEN
                   '34ae1613-9645-4222-a9d2-e5f243dea2865/Transportation/Train4.png'
                 ELSE 'ad78aafb-83a6-4c07-b2b9-a897a8b6a38f/Shapes/bus.png'
                 END AS icon,
               CASE WHEN occupancy_status IS NULL THEN 'Unknown'
                 WHEN occupancy_status = 0 THEN 'Empty'
                 WHEN occupancy_status = 1 THEN 'Many seats available'
                 WHEN occupancy_status = 2 THEN 'Few seats available'
                 WHEN occupancy_status = 3 THEN 'Standing room only'
                 WHEN occupancy_status = 4
                   THEN 'Crushed standing room only'
                 WHEN occupancy_status = 5 THEN 'Full'
                 WHEN occupancy_status = 6
                   THEN 'Not accepting passengers'
                 ELSE 'Unknown' END AS occupancy_label
        FROM classified),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY cot_id
                 ORDER BY seq DESC) AS rn
        FROM decoded)
      SELECT cot_id AS id, cot_type,
             'Route ' || route || ' - ' || vtype || ' ' || vehicle_id
               AS callsign,
             STRFTIME(make_timestamp(timestamp * 1000000),
               '%Y-%m-%d %H:%M:%S') AS time_s,
             CASE WHEN speed IS NULL OR speed = 0 THEN 'NaN'::DOUBLE
                  ELSE speed END AS speed,
             CASE WHEN bearing = 0 THEN 'NaN'::DOUBLE
                  ELSE bearing END AS course,
             marker_color,
             180000 AS stale,
             route AS meta_route,
             direction_id AS meta_direction,
             occupancy_label AS meta_occupancy,
             'Vehicle Type: ' || vtype || chr(10) ||
             'Vehicle ID: ' || vehicle_id || chr(10) ||
             'Route ID: ' || route || chr(10) ||
             'Trip ID: ' || trip_id || chr(10) ||
             'Direction: ' || direction_id || chr(10) ||
             'Start Time: 07:30:00' ||
             CASE WHEN occupancy_status IS NOT NULL
               THEN chr(10) || 'Occupancy: ' || occupancy_label
               ELSE '' END ||
             CASE WHEN speed IS NOT NULL
               THEN chr(10) || 'Speed: ' || printf('%.1f', speed)
                 || ' m/s'
               ELSE '' END AS remarks,
             icon,
             longitude AS lon, latitude AS lat
      FROM ranked WHERE rn = 1
      ORDER BY id"""))

  /** Config-driven class filter (F4, task.ts:245-249): hide buses →
    * only trains and ships survive; verifies the Catalyst plan
    * simplifies the per-row predicate to a constant-folded filter. */
  val q40 = Qry(
    "q40_metlink_config_filter",
    (s: SparkSession, d: String) =>
      Metlink.transform(synthFeed(s, d), col("seq"),
          Metlink.Config(showBuses = false))
        .groupBy(col("properties.type").as("cot_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("cot_type")),
    Some("""
      WITH src AS (
        SELECT event_id AS seq,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               event_type, user_id
        FROM events WHERE event_id < 2000),
      feed AS (
        SELECT seq,
               CASE WHEN event_type = 'signup' THEN 'QDF__' || k
                    WHEN event_type = 'error' THEN 'HVL__' || k
                    WHEN event_type = 'view' THEN 'MIF__' || k
                    WHEN event_type = 'click' THEN ''
                    ELSE k || '__20240115__x' END AS trip_id,
               CASE WHEN k % 17 = 0 THEN 0.0 ELSE 1.0 END AS lat_ok,
               'veh-' || user_id AS vehicle_id
        FROM src),
      classified AS (
        SELECT *,
               CASE WHEN starts_with(trip_id, 'QDF')
                      OR string_split(trip_id, '__')[1] = 'MIF'
                    THEN 'Ship'
                    WHEN starts_with(trip_id, 'HVL')
                    THEN 'Train' ELSE 'Bus' END AS vtype
        FROM feed
        WHERE lat_ok <> 0.0 AND trip_id <> ''),
      kept AS (
        SELECT *,
               'WLG-Metlink' || vtype || '-' || vehicle_id AS cot_id,
               CASE vtype WHEN 'Ship' THEN 'a-f-S-E-V'
                 WHEN 'Train' THEN 'a-u-G-E-V'
                 ELSE 'a-f-G-E-V-C' END AS cot_type
        FROM classified WHERE vtype <> 'Bus'),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY cot_id
                 ORDER BY seq DESC) AS rn
        FROM kept)
      SELECT cot_type, COUNT(*) AS n
      FROM ranked WHERE rn = 1
      GROUP BY cot_type ORDER BY cot_type"""))

  val all: Seq[Qry] = Seq(q39, q40)
}
