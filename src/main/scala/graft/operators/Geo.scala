package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planar proximity join by grid-cell bucketing: find all point
  * pairs within radius r without the all-pairs cross join.
  *
  * Points hash to square cells of side ≥ r; a pair within r can then
  * differ by at most one cell per axis, so candidates live in the
  * 3×3 cell neighborhood. One side replicates onto the self cell
  * plus the four FORWARD neighbor offsets (map-side explode, column
  * pruned to id+coords — half the box suffices because an unordered
  * pair's delta falls in one endpoint's forward half, r16), the
  * other keys by its own cell, and the candidate generation is a
  * plain EQUI-join on the cell key — the shuffle Spark scales
  * linearly, vs the quadratic theta-join a naive `dist < r`
  * predicate would plan (BNLJ). The exact squared-distance predicate
  * then filters candidates; each qualifying cross-cell pair surfaces
  * exactly once (same-cell pairs are id-ordered), and the output
  * normalizes ids so a < b. Integer coordinates end to end — the
  * distance test is exact on any engine.
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
    // HALF neighborhood (r16, guide §2.3 shuffle fewer bytes): the
    // full 3×3 probe replica found every cross-cell pair TWICE (once
    // per orientation; a<b kept one), so probing only the self cell
    // plus the four "forward" offsets — O with O ∪ −O = the 3×3 box
    // and O ∩ −O = {self} — emits each cross-cell pair exactly once
    // (whichever endpoint sees the other in its forward half) and
    // cuts the replicated probe stream from 9× to 5× and the
    // candidate join output roughly in half. Same-cell pairs still
    // appear in both orientations; the a<b filter applies to the
    // self offset only, and ids/coords are order-normalized after
    // the distance test so the (a < b) output contract is unchanged.
    val offsets = array(
      (Seq((0, 0), (1, -1), (1, 0), (1, 1), (0, 1))
        .map { case (dx, dy) =>
          struct(lit(dx).as("dx"), lit(dy).as("dy")) }): _*)
    val probe = pts
      .withColumn("o", explode(offsets))
      .select(col("a"), col("ax"), col("ay"),
        (col("acx") + col("o.dx")).as("cx"),
        (col("acy") + col("o.dy")).as("cy"),
        (col("o.dx") === 0 && col("o.dy") === 0).as("self"))
    val build = points.select(col(idCol).as("b"),
      col(xCol).as("bx"), col(yCol).as("by"),
      expr(s"$xCol div $cellSize").as("cx"),
      expr(s"$yCol div $cellSize").as("cy"))
    probe.join(build, Seq("cx", "cy"))
      .filter(!col("self") || col("a") < col("b"))
      .withColumn("d2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("d2") <= r2)
      .select(
        when(col("a") < col("b"), struct(
          col("a").as("a"), col("b").as("b"),
          col("ax").as("ax"), col("ay").as("ay"),
          col("bx").as("bx"), col("by").as("by")))
        .otherwise(struct(
          col("b").as("a"), col("a").as("b"),
          col("bx").as("ax"), col("by").as("ay"),
          col("ax").as("bx"), col("ay").as("by"))).as("p"),
        col("d2"))
      .select(col("p.a").as("a"), col("p.b").as("b"),
        col("p.ax").as("ax"), col("p.ay").as("ay"),
        col("p.bx").as("bx"), col("p.by").as("by"), col("d2"))
  }
}
