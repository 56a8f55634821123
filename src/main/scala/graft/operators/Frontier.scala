package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated by any other
  * row, minimizing `x` while maximizing `y` — "cheapest part for its
  * size class", "fastest config under each cost cap".
  *
  * The input is first reduced to one candidate per x value (only the
  * max-y row at a given x can survive — any same-x smaller-y row is
  * strictly dominated). Over candidates sorted by x ascending, a
  * candidate survives iff its y strictly exceeds the prefix max of
  * all cheaper candidates.
  *
  * Scale shape — the skyline is DISTRIBUTIVE:
  * skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)), because a
  * dominator that removes a point in the union also survives (or is
  * itself dominated by a survivor) in its own part. So phase 1 runs
  * the prefix-max filter WITHIN x-range bands (windows partitioned
  * by band — parallel, no global sort), and phase 2 re-runs it over
  * the tiny union of local frontiers (per-band frontier size is
  * bounded by the band's distinct-y count, ≤ |y domain|). Only
  * phase 2 touches a single-partition window, over O(bands·|y|)
  * rows, never the input.
  */
object Frontier {

  private def prefixMaxFilter(df: DataFrame, partCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    val base = if (partCols.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(partCols.map(col): _*)
    val pmax = max(col(yCol))
      .over(base.orderBy(col(xCol))
        .rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("_pmax", pmax)
      .filter(col("_pmax").isNull || col(yCol) > col("_pmax"))
      .drop("_pmax")
  }

  /** Skyline of (x, y) minimizing x, maximizing y.
    *
    * @param bandExpr SQL expression over `xCol` assigning the
    *                 phase-1 band (e.g. `floor(price / 10)`); any
    *                 monotone bucketing of x works
    * @return (x, y) frontier rows, one per surviving x
    */
  def skyline(df: DataFrame, xCol: String, yCol: String,
      bandExpr: String): DataFrame = {
    val candidates = df.groupBy(col(xCol))
      .agg(max(col(yCol)).as(yCol))
    val local = prefixMaxFilter(
      candidates.withColumn("_band", expr(bandExpr)),
      Seq("_band"), xCol, yCol)
    prefixMaxFilter(local.drop("_band"), Seq.empty, xCol, yCol)
  }
}
