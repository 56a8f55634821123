package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** The native Hilbert kernel against the published 4×4 curve, plus
  * the two properties that define it: bijectivity and unit-step
  * adjacency (consecutive indices are grid-neighbors — the property
  * the Morton key does NOT have, which is the whole reason the
  * kernel exists). */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def grid(bits: Int) = {
    val n = 1 << bits
    (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("h", ZOrder.hilbert2d(col("x"), col("y"), bits))
  }

  test("order-2 curve matches the published 4x4 walk") {
    val got = grid(2).collect()
      .map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1).map(_._2).toList
    // d = 0..15 of the standard xy2d construction
    assert(got === List(
      (0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L),
      (0L, 2L), (0L, 3L), (1L, 3L), (1L, 2L),
      (2L, 2L), (2L, 3L), (3L, 3L), (3L, 2L),
      (3L, 1L), (2L, 1L), (2L, 0L), (3L, 0L)))
  }

  test("bijective and unit-step adjacent on the full 32x32 grid") {
    val rows = grid(5).collect()
      .map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
    assert(rows.map(_._1).toSet === (0L until 1024L).toSet)
    val walk = rows.sortBy(_._1).map(_._2).toList
    walk.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
  }

  test("Morton violates adjacency where Hilbert holds it (the seam)") {
    // Morton d=1 -> (1,0), d=2 -> (0,1): diagonal jump (distance 2);
    // the Hilbert walk above never exceeds 1
    val m = grid(2)
      .withColumn("z", ZOrder.interleave16(col("x"), col("y")))
      .collect().map(r => (r.getLong(3), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1).map(_._2).toList
    val jumps = m.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1 }
    assert(jumps > 0)
  }

  test("bucket bbox bound: high 6 bits pin both axes to a 128-cell") {
    // deterministic scatter over the 1024-domain
    val pts = (0 until 4096).map { i =>
      ((i * 2654435761L) % 1024, (i * 40503L) % 1024) }
      .toDF("x", "y")
    val spans = pts
      .withColumn("h", ZOrder.hilbert2d(col("x"), col("y"), 10))
      .withColumn("b", expr("h div 16384"))
      .groupBy("b")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .agg(max("xs"), max("ys")).collect().head
    assert(spans.getLong(0) <= 127 && spans.getLong(1) <= 127)
  }

  test("out-of-range and null coordinates yield NULL") {
    val df = Seq((1024L, 0L), (-1L, 5L), (3L, 3L))
      .toDF("x", "y")
      .withColumn("h", ZOrder.hilbert2d(col("x"), col("y"), 10))
    val got = df.select("h").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.count(_.isEmpty) === 2 && got.count(_.isDefined) === 1)
    val nulls = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .withColumn("h", ZOrder.hilbert2d(col("x"), col("y"), 10))
    assert(nulls.select("h").collect().head.isNullAt(0))
  }

  test("interpreted eval agrees with the codegen'd path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val viaEval = (for (x <- 0L until 8L; y <- 0L until 8L) yield
      graft.functions.Hilbert2D(Literal(x), Literal(y), 3)
        .eval(null).asInstanceOf[Long]).toList
    val viaDf = grid(3).orderBy("x", "y")
      .select("h").as[Long].collect().toList
    assert(viaEval === viaDf)
  }
}
