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

  // ---- HilbertN (Skilling's N-dimensional transpose form) --------

  test("hilbertN at dims=2 reproduces Hilbert2D bit-for-bit (full 32x32)") {
    val n = 32
    val both = (for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong)).toDF("x", "y")
      .withColumn("h2", ZOrder.hilbert2d(col("x"), col("y"), 5))
      .withColumn("hn", ZOrder.hilbertN(Seq(col("x"), col("y")), 5))
    assert(both.filter(col("h2") =!= col("hn")).count() === 0L)
  }

  test("hilbertN dims=3 is bijective and unit-step adjacent on the 8^3 grid") {
    val n = 8
    val pts = (for (x <- 0 until n; y <- 0 until n; z <- 0 until n)
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
      .withColumn("h",
        ZOrder.hilbertN(Seq(col("x"), col("y"), col("z")), 3))
      .collect().map(r => (r.getLong(3),
        (r.getLong(0), r.getLong(1), r.getLong(2))))
      .sortBy(_._1)
    assert(pts.map(_._1).toList === (0L until (n.toLong * n * n)).toList,
      "3-D index is not a bijection onto 0..n^3-1")
    pts.sliding(2).foreach { case Array((_, a), (_, b)) =>
      val manhattan = math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs(a._3 - b._3)
      assert(manhattan === 1L,
        s"consecutive 3-D indices not grid-neighbors: $a -> $b")
    }
  }

  test("hilbertN interpreted eval agrees with the codegen'd path (3-D)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val viaEval = (for (x <- 0L until 4L; y <- 0L until 4L;
        z <- 0L until 4L) yield
      graft.functions.HilbertN(
          Seq(Literal(x), Literal(y), Literal(z)), 2)
        .eval(null).asInstanceOf[Long]).toList
    val viaDf = (for (x <- 0L until 4L; y <- 0L until 4L;
        z <- 0L until 4L) yield (x, y, z)).toDF("x", "y", "z")
      .withColumn("h",
        ZOrder.hilbertN(Seq(col("x"), col("y"), col("z")), 2))
      .orderBy("x", "y", "z").select("h").as[Long].collect().toList
    assert(viaEval === viaDf)
  }

  test("hilbertDecode is the exact inverse of hilbertN (2-D and 3-D, exhaustive)") {
    val enc3 = (for (x <- 0L until 8L; y <- 0L until 8L;
        z <- 0L until 8L) yield (x, y, z)).toDF("x", "y", "z")
      .withColumn("h",
        ZOrder.hilbertN(Seq(col("x"), col("y"), col("z")), 3))
      .collect().map(r => (r.getLong(3),
        Array(r.getLong(0), r.getLong(1), r.getLong(2))))
    enc3.foreach { case (h, p) =>
      assert(ZOrder.hilbertDecode(3, 3, h).sameElements(p),
        s"decode($h) != ${p.toList}")
    }
    val enc2 = (for (x <- 0L until 32L; y <- 0L until 32L)
      yield (x, y)).toDF("x", "y")
      .withColumn("h", ZOrder.hilbert2d(col("x"), col("y"), 5))
      .collect().map(r => (r.getLong(2),
        Array(r.getLong(0), r.getLong(1))))
    enc2.foreach { case (h, p) =>
      assert(ZOrder.hilbertDecode(5, 2, h).sameElements(p),
        s"2-D decode($h) != ${p.toList}")
    }
  }

  test("hilbertCoveringBuckets: every point's bucket is in its box's cover") {
    // for random-ish boxes, any grid point inside the box must land
    // in a covered bucket (no false pruning — the safety property)
    val bits = 5; val dims = 2; val levels = 2
    val shift = dims * (bits - levels)
    for (seed <- 1 to 5) {
      val lo = (seed * 3 % 20).toLong
      val box = Seq((lo, lo + 9L), ((seed * 7 % 18).toLong,
        (seed * 7 % 18).toLong + 11L))
      val cover = ZOrder.hilbertCoveringBuckets(bits, dims, levels,
        box).toSet
      for (x <- box(0)._1 to box(0)._2; y <- box(1)._1 to box(1)._2) {
        val h = graft.functions.HilbertN(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(x),
          org.apache.spark.sql.catalyst.expressions.Literal(y)), bits)
          .eval(null).asInstanceOf[Long]
        assert(cover.contains(h >> shift),
          s"point ($x,$y) bucket ${h >> shift} missing from cover of $box")
      }
    }
  }

  test("hilbertN out-of-range/null coordinates yield NULL; bad arity fails") {
    val df = Seq((8L, 0L, 0L), (-1L, 5L, 2L), (3L, 3L, 3L))
      .toDF("x", "y", "z")
      .withColumn("h",
        ZOrder.hilbertN(Seq(col("x"), col("y"), col("z")), 3))
    val got = df.select("h").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.count(_.isEmpty) === 2 && got.count(_.isDefined) === 1)
    intercept[Exception] {
      spark.sql("SELECT hilbertn(10)").collect()
    }
    intercept[Exception] {
      // dims*bits > 63 must be rejected
      Seq((1L, 1L, 1L)).toDF("x", "y", "z")
        .withColumn("h",
          ZOrder.hilbertN(Seq(col("x"), col("y"), col("z")), 22))
        .collect()
    }
  }
}
