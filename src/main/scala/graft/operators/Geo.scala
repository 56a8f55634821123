package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planar proximity join by grid-cell bucketing: find all point
  * pairs within radius r without the all-pairs cross join.
  *
  * Points hash to square cells of side ≥ r; a pair within r can then
  * differ by at most one cell per axis, so candidates are exactly
  * the 3×3 cell neighborhood. One side replicates 9× onto its
  * neighbor cells (map-side explode of nine offsets — cheap, column
  * pruned to id+coords), the other keys by its own cell, and the
  * candidate generation is a plain EQUI-join on the cell key — the
  * shuffle Spark scales linearly, vs the quadratic theta-join a
  * naive `dist < r` predicate would plan (BNLJ). The exact
  * squared-distance predicate then filters candidates; each
  * qualifying pair surfaces exactly once because the cell delta of a
  * fixed pair matches exactly one of the nine offsets and ids are
  * ordered. Integer coordinates end to end — the distance test is
  * exact on any engine.
  *
  * At 100 TB the skew risk is dense cells (urban clusters): AQE
  * skew-join splitting handles moderate cases; extreme ones shrink
  * the cell side (more, smaller cells — still ≥ r) or salt the hot
  * cell ids. Output fan-out is physically bounded by points-per-cell
  * density, never by table size.
  */
object Geo {

  /** All unordered point pairs with squared distance ≤ `r2`.
    *
    * Coordinate contract: NON-NEGATIVE coordinates. Cell assignment
    * uses SQL `div`, which truncates toward zero — with negative
    * coordinates cell 0 would span (-cellSize, cellSize), twice the
    * width of every other cell. Pair coverage and once-only emission
    * would still hold (the 3×3 neighborhood and the unique-offset
    * argument don't depend on uniform cell width), but the origin
    * cell would carry double density (skew) and cell ids would
    * diverge from a floor-division mirror. Shift negative ranges
    * into the positive quadrant before calling (all current callers
    * feed md5-derived non-negative grids).
    *
    * @param points `idCol` unique long, `xCol`/`yCol` integer (long)
    *               coordinates, ≥ 0 per the contract above
    * @param cellSize grid cell side; MUST satisfy cellSize² ≥ r2
    * @return (a, b, ax, ay, bx, by, d2) with a < b
    */
  def proximityPairs(points: DataFrame, idCol: String, xCol: String,
      yCol: String, cellSize: Long, r2: Long): DataFrame = {
    require(cellSize * cellSize >= r2,
      s"cellSize^2 (${cellSize * cellSize}) must cover r2 ($r2)")
    val pts = points.select(col(idCol).as("a"),
      col(xCol).as("ax"), col(yCol).as("ay"),
      expr(s"$xCol div $cellSize").as("acx"),
      expr(s"$yCol div $cellSize").as("acy"))
    val offsets = array((for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val probe = pts
      .withColumn("o", explode(offsets))
      .select(col("a"), col("ax"), col("ay"),
        (col("acx") + col("o.dx")).as("cx"),
        (col("acy") + col("o.dy")).as("cy"))
    val build = points.select(col(idCol).as("b"),
      col(xCol).as("bx"), col(yCol).as("by"),
      expr(s"$xCol div $cellSize").as("cx"),
      expr(s"$yCol div $cellSize").as("cy"))
    probe.join(build, Seq("cx", "cy"))
      .filter(col("a") < col("b"))
      .withColumn("d2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("d2") <= r2)
      .select(col("a"), col("b"), col("ax"), col("ay"),
        col("bx"), col("by"), col("d2"))
  }
}
