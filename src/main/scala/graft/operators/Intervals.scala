package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed [start, end) spans — the union/merge
  * ("coalesce overlapping intervals") operator behind availability
  * windows, on-call coverage, and dwell-time analytics.
  *
  * Algorithm: within each key, order intervals by start; an interval
  * opens a NEW merged group iff its start lies strictly past the
  * running maximum end of every earlier interval (prefix max over the
  * preceding rows — touching intervals, `start == prev end`, merge,
  * matching half-open span semantics). A running sum of the new-group
  * flags labels each merged group; min(start)/max(end) per label is
  * the merged interval.
  *
  * Scale shape: both windows partition on the key — per-key sort,
  * no global ordering, one shuffle on the key reused by the final
  * groupBy (same partitioning expression, so Catalyst plans a single
  * Exchange). Pure integer arithmetic end to end: deterministic
  * under any partitioning, and tie-proof — equal starts imply equal
  * flag decisions because the prefix max already covers the tied
  * start (end ≥ tied start + every span is non-negative).
  */
object Intervals {

  /** Merge overlapping/touching [start, end) intervals per key.
    *
    * @param df       input with `keyCol`, `startCol`, `endCol`
    *                 (numeric, e.g. epoch seconds; end ≥ start)
    * @param tieCol   unique per-row column ordering ties (equal
    *                 starts) deterministically
    * @return one row per merged interval:
    *         (key, m_start, m_end, n_source) — sources counted into
    *         each merged span
    */
  def merge(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(tieCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df.withColumn("_new_grp",
      when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
    val labeled = flagged.withColumn("_grp",
      sum(col("_new_grp"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    labeled.groupBy(col(keyCol), col("_grp"))
      .agg(
        min(col(startCol)).as("m_start"),
        max(col(endCol)).as("m_end"),
        count(lit(1)).as("n_source"))
      .drop("_grp")
  }
}
