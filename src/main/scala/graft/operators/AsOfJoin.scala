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
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     build side (its `payload` columns are attached)
    * @param key       equi-join key column name (present on both sides)
    * @param ts        event-time column name (present on both sides)
    * @param payload   right-side columns to carry to matched left rows
    * @return left columns + payload columns (null when no prior right row)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.forall(right.columns.contains),
      s"payload columns ${payload.filterNot(right.columns.contains)} " +
        "missing from right side")
    require(payload.forall(!leftCols.contains(_)),
      s"payload columns ${payload.filter(leftCols.contains)} collide " +
        "with left-side columns — alias them first")
    // tag 0 = right/build, 1 = left/probe; right wins ties at equal ts.
    val taggedRight = right.select(
      col(key) +: col(ts) +: lit(0).as("__side") +:
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        payload.map(c => col(c).as(s"__p_$c")): _*)
    val taggedLeft = left.select(
      col(key) +: col(ts) +: lit(1).as("__side") +:
        leftCols.filterNot(c => c == key || c == ts).map(col) ++:
        payload.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__p_$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .select((leftCols.map(col) ++ payload.map(c =>
        last(col(s"__p_$c"), ignoreNulls = true).over(w).as(c)) :+
        col("__side")): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
