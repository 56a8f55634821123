package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution: each conversion event credits
  * the marketing/product touches that preceded it within a lookback
  * window, under the three classic models at once — first-touch
  * (100% to the earliest touch), last-touch (100% to the latest),
  * and linear (split evenly). Conversions with no touch in the
  * window credit a synthetic `(direct)` channel.
  *
  * All money stays in exact integers: conversion value is
  * cent-snapped once, and the linear split is integer millicents
  * `(cents·1000) div n` — engine-independent floor division, so the
  * per-channel totals hash bit-identically (the ≤ n−1 millicent
  * split remainder is dropped, consistently, on every engine).
  *
  * Scale shape: the touch↔conversion pairing is an equi-join on the
  * user key with a bounded time-range predicate — one exchange each
  * side, pair fan-out bounded by touches-per-user within the
  * lookback. The per-conversion ranks are windows over the SAME user
  * partitioning (no second exchange); per-channel rollup is a tiny
  * final aggregate. A pathological hot user (bot traffic) is the
  * usual salting candidate; real pipelines cap touches-per-user
  * upstream, as the caller's filter should here.
  */
object Attribution {

  /** Per-(conversion, touch) credit rows plus `(direct)` rows for
    * untouched conversions.
    *
    * @param events    event stream with `userCol, idCol, tsCol` and
    *                  `typeCol, valueCol`
    * @param convType  event type that counts as a conversion
    * @param touchTypes event types that can receive credit
    * @param lookbackMicros pairing window: touch.ts ∈
    *                  (conv.ts − lookback, conv.ts]
    * @return columns: conv_id, channel, cents (conversion value),
    *         n_touches, first_cents / last_cents (the full value on
    *         the winning touch row, else 0), linear_millis
    */
  def credits(events: DataFrame, userCol: String, idCol: String,
      tsCol: String, typeCol: String, valueCol: String,
      convType: String, touchTypes: Seq[String],
      lookbackMicros: Long): DataFrame = {
    val base = events.select(
      col(userCol).as("u"), col(idCol), col(typeCol),
      unix_micros(col(tsCol)).as("t"),
      floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("cents"))
    // distinct key names on each side: both legs derive from the
    // same base frame, so df("u") disambiguation can't be trusted
    val conv = base.filter(col(typeCol) === convType)
      .select(col("u").as("cu"), col(idCol).as("conv_id"),
        col("t").as("ct"), col("cents"))
    val touch = base.filter(col(typeCol).isin(touchTypes: _*))
      .select(col("u"), col(idCol).as("touch_id"),
        col(typeCol).as("channel"), col("t").as("tt"))
    val paired = conv.join(touch,
      col("cu") === col("u") && col("tt") <= col("ct") &&
        col("tt") > col("ct") - lit(lookbackMicros), "left")
      .drop("u")
    // ranks partition on (cu, conv_id): conv_id is unique so the
    // grouping is per-conversion, but leading with the join's user
    // key lets HashPartitioning(cu) satisfy the window's clustered
    // distribution — no second exchange after the pairing join
    val byConv = Window.partitionBy(col("cu"), col("conv_id"))
    val asc = byConv.orderBy(col("tt").asc, col("touch_id").asc)
    val desc = byConv.orderBy(col("tt").desc, col("touch_id").desc)
    paired
      .withColumn("n_touches",
        count(col("touch_id")).over(byConv))
      .withColumn("rn_first", row_number().over(asc))
      .withColumn("rn_last", row_number().over(desc))
      .select(
        col("conv_id"), col("cents"), col("n_touches"),
        coalesce(col("channel"), lit("(direct)")).as("channel"),
        when(col("n_touches") === 0 || col("rn_first") === 1,
          col("cents")).otherwise(0L).as("first_cents"),
        when(col("n_touches") === 0 || col("rn_last") === 1,
          col("cents")).otherwise(0L).as("last_cents"),
        when(col("n_touches") === 0, col("cents") * 1000L)
          .otherwise(expr("(cents * 1000) div n_touches"))
          .cast("long").as("linear_millis"))
  }
}
