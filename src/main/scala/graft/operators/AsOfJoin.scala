package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the payload of the
  * most recent right row with `right.ts <= left.ts` for the same key.
  *
  * Generalizes the reference's "latest state per key" idea (last-wins
  * dedup, task.ts:312) into a two-table temporal operator the reference
  * lacks (SURVEY.md §2.B G4).
  *
  * Scale design: the naive formulation is a theta join
  * (`l.ts >= r.ts`) that Spark executes as a broadcast-nested-loop —
  * O(|L|·|R|) and a non-starter at 100 TB. This implementation instead
  * UNIONs the two sides tagged, sorts once within each key partition,
  * and propagates the last-seen right payload with
  * `last(_, ignoreNulls)` over an unbounded-preceding frame: one
  * shuffle on the key, O((|L|+|R|) log) per partition, skew handled by
  * AQE. Same algorithm as Flink's event-time temporal join.
  *
  * Right rows sort before left rows at equal (key, ts) so the join is
  * inclusive (a right row exactly at `l.ts` is visible to it).
  *
  * `direction` and `tolerance` give pandas-merge_asof parity:
  * backward (default) matches the latest right row at-or-before the
  * left ts; forward matches the EARLIEST right row at-or-after it
  * (same algorithm over the reversed sort); `tolerance` nulls the
  * payload when the matched row's ts is farther from the left ts
  * than the caller's predicate allows.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     build side (its `payload` columns are attached)
    * @param key       equi-join key column name (present on both sides)
    * @param ts        event-time column name (present on both sides)
    * @param payload   right-side columns to carry to matched left rows
    * @param tiebreak  right-side columns ordering ties at equal
    *                  (key, ts): the row greatest under this order
    *                  wins. Empty = caller asserts (key, ts) is
    *                  unique on the right; with duplicates and no
    *                  tiebreak the attached payload is
    *                  nondeterministic across runs/retries.
    * @param direction "backward" (latest right at-or-before) or
    *                  "forward" (earliest right at-or-after)
    * @param tolerance optional (leftTs, matchedRightTs) => boolean
    *                  predicate; a match failing it is nulled out —
    *                  e.g. `(l, r) => l - r <= lit(300)` for numeric
    *                  seconds, or interval arithmetic for timestamps
    * @return left columns + payload columns (null when no match)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String], tiebreak: Seq[String] = Nil,
           direction: String = "backward",
           tolerance: Option[(Column, Column) => Column] = None)
      : DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    // Spark resolves column names case-insensitively by default, so
    // the guards must too; duplicates would alias-collide later.
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val rightLc = right.columns.map(lc).toSet
    val leftLc = leftCols.map(lc).toSet
    require(payload.map(lc).distinct.size == payload.size,
      s"duplicate payload columns in $payload")
    require(payload.forall(c => rightLc.contains(lc(c))),
      s"payload columns ${payload.filterNot(c => rightLc.contains(lc(c)))} " +
        "missing from right side")
    require(payload.forall(c => !leftLc.contains(lc(c))),
      s"payload columns ${payload.filter(c => leftLc.contains(lc(c)))} " +
        "collide with left-side columns — alias them first")
    // The whole right-row payload travels as ONE struct: right rows
    // carry a non-null struct (even if every field in it is null),
    // left rows carry a null struct. last(_, ignoreNulls) then picks
    // the latest right ROW atomically — a null field in the true
    // as-of row is preserved (never replaced by a stale older row),
    // and multiple payload columns can never tear across rows.
    // the matched right row's ts rides inside the struct so the
    // tolerance check can compare against it after the window
    val payloadStruct = struct(col(ts).as("__rts") +: payload.map(col): _*)
    val payloadType = {
      val r = right.select(payloadStruct.as("__p"))
      r.schema("__p").dataType
    }
    require(tiebreak.forall(c => rightLc.contains(lc(c))),
      s"tiebreak columns ${tiebreak.filterNot(c => rightLc.contains(lc(c)))} " +
        "missing from right side")
    val tieNames = tiebreak.indices.map(i => s"__tie$i")
    val tieTypes = tiebreak.map(c =>
      right.schema(right.schema.fieldIndex(c)).dataType)
    // tag 0 = right/build, 1 = left/probe; right wins ties at equal ts.
    val taggedRight = right.select(
      (Seq(col(key), col(ts), lit(0).as("__side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        tiebreak.zip(tieNames).map { case (c, t) => col(c).as(t) } ++
        Seq(payloadStruct.as("__p"))): _*)
    val taggedLeft = left.select(
      (Seq(col(key), col(ts), lit(1).as("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        tieNames.zip(tieTypes).map { case (t, dt) =>
          lit(null).cast(dt).as(t) } ++
        Seq(lit(null).cast(payloadType).as("__p"))): _*)
    // Tie columns order right rows deterministically within equal
    // (key, ts); __side still sorts every right row before any left
    // row at the same ts, so inclusivity is unchanged. For the
    // forward direction the ts sort is simply reversed: "the last
    // right row seen walking down from +∞" IS the earliest row
    // at-or-after the current one. Equal-ts tie ordering stays
    // ascending so the greatest tiebreak wins in both directions.
    val tsOrder =
      if (direction == "backward") col(ts).asc else col(ts).desc
    val w = Window.partitionBy(col(key))
      .orderBy(tsOrder +: col("__side").asc +:
        tieNames.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tolOk: Column = tolerance
      .map(f => f(col(ts), col("__pLast.__rts")))
      .getOrElse(lit(true))
    taggedRight.unionByName(taggedLeft)
      .withColumn("__pLast", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c =>
          when(tolOk, col(s"__pLast.$c")).otherwise(lit(null)).as(c)): _*)
  }
}
