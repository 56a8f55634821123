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

  /** 3-D skyline: minimize `x`, maximize `y` and `z` — the
    * band-partition generalization the 2-D operator's scaladoc
    * promises. Past two dimensions no single sort order linearizes
    * dominance (a prefix max over x-sorted rows can't see both y and
    * z), so each phase tests dominance with a join instead of a
    * window; distributivity (skyline(A ∪ B) =
    * skyline(skyline(A) ∪ skyline(B))) still holds for any d, so the
    * two-phase shape survives:
    *
    *   phase 0  groupBy(x, y) → max(z): same-(x, y) rows with smaller
    *            z are dominated — a cheap exact pre-reduction.
    *   phase 1  WITHIN each x-band, drop rows dominated by a same-band
    *            row. The dominance join carries the band equi-key, so
    *            it plans as a hash join whose per-key fan-out is the
    *            band size — never a global cross product.
    *   phase 2  one dominance anti-join of the surviving union
    *            against itself (survivors from a lower band can
    *            dominate a higher band's). This IS a broadcast
    *            nested-loop anti-join, over frontier candidates only
    *            — O(Σ band-frontier)², never the input. That bounded
    *            survivor set is the contract (same as the 2-D global
    *            pass); in high d or adversarial data the frontier
    *            itself is large and no skyline algorithm saves you.
    *
    * Ties/duplicates: dominance requires strict improvement in ≥ 1
    * coordinate, so exact-tie rows (same x, y, z after phase 0 there
    * are none) and incomparable rows all survive.
    */
  def skyline3(df: DataFrame, xCol: String, yCol: String, zCol: String,
      bandExpr: String): DataFrame = {
    // q (the "_q"-suffixed side) dominates p (the bare side)
    def dominated =
      col(s"${xCol}_q") <= col(xCol) && col(s"${yCol}_q") >= col(yCol) &&
        col(s"${zCol}_q") >= col(zCol) &&
        (col(s"${xCol}_q") < col(xCol) || col(s"${yCol}_q") > col(yCol) ||
          col(s"${zCol}_q") > col(zCol))
    def qSide(d: DataFrame) = d.select(
      col(xCol).as(s"${xCol}_q"), col(yCol).as(s"${yCol}_q"),
      col(zCol).as(s"${zCol}_q"))
    val cand = df.groupBy(col(xCol), col(yCol))
      .agg(max(col(zCol)).as(zCol))
      .withColumn("_band", expr(bandExpr))
    val bandQ = cand.select(
      col(xCol).as(s"${xCol}_q"), col(yCol).as(s"${yCol}_q"),
      col(zCol).as(s"${zCol}_q"), col("_band").as("_band_q"))
    // The survivor union feeds BOTH sides of the global self-join;
    // checkpointing it (it is frontier-sized, bounded by Σ per-band
    // frontiers) keeps phase 1 from running twice.
    val local = cand.join(bandQ,
        col("_band") === col("_band_q") && dominated,
        "left_anti")
      .drop("_band")
      .transform(Ckpt.cut)
    local.join(broadcast(qSide(local)), dominated, "left_anti")
  }
}
