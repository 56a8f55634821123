package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (SURVEY.md §2.B G12, batch form): events
  * within `gap` of their predecessor (per key) share a session. The
  * classic lag → boundary-flag → cumulative-sum pattern: two window
  * passes over ONE shuffle (both windows share the key partition), no
  * state store needed in batch. The streaming twin is
  * `session_window` / `flatMapGroupsWithState` in
  * [[graft.streaming.StreamOps]].
  */
object Sessionize {

  /** Adds `session_id` (0-based per key) to `df`.
    *
    * @param keyCol partition key column name (e.g. user)
    * @param tsCol  event-time column name
    * @param gapSec max intra-session gap in seconds
    */
  def withSessionId(df: DataFrame, keyCol: String, tsCol: String,
      gapSec: Long): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol))
    val sinceStart = byTime
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev_ts", lag(col(tsCol), 1).over(byTime))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev_ts"))
            > gapSec * 1000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(sinceStart) - 1)
      .drop("__prev_ts", "__new_session")
  }

  /** Per-session summary: bounds, duration, event count, value sum. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      gapSec: Long): DataFrame =
    withSessionId(df, keyCol, tsCol, gapSec)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        ((unix_micros(max(col(tsCol))) -
          unix_micros(min(col(tsCol)))) / lit(1000000L)).cast("long")
          .as("duration_sec"),
        count(lit(1)).as("n_events"))
}
