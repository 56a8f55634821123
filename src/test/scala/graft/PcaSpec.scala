package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** Unit semantics for [[Pca]] (q187): hand-computed covariance,
  * dominant eigenvector recovery, unit normalization, and the
  * zero-matrix / empty-input guards.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covariance matches the hand-computed 2x2 case") {
    // rows (1,2) and (3,6): mean (2,4); population cov =
    // [[1, 2], [2, 4]]
    val df = Seq(Array(1f, 2f), Array(3f, 6f)).toDF("e")
    val c = Pca.covariance(df, "e", 2)
      .as[(Int, Int, Double)].collect()
      .map { case (i, j, v) => (i, j) -> v }.toMap
    assert(c((0, 0)) === 1.0 && c((1, 1)) === 4.0)
    assert(c((0, 1)) === 2.0 && c((1, 0)) === 2.0)
  }

  test("dominant eigenvector of the rank-1 case, unit-normalized") {
    // cov [[1,2],[2,4]] is rank 1 with eigenvector (1,2)/sqrt(5)
    val df = Seq(Array(1f, 2f), Array(3f, 6f)).toDF("e")
    val v = Pca.topComponent(df, "e", 2, iters = 3)
      .as[(Int, Double)].collect().toMap
    val expect0 = 1.0 / math.sqrt(5.0)
    assert(math.abs(v(0) - expect0) < 1e-6, s"got ${v(0)}")
    assert(math.abs(v(1) - 2.0 * expect0) < 1e-6, s"got ${v(1)}")
    assert(math.abs(v(0) * v(0) + v(1) * v(1) - 1.0) < 1e-9)
  }

  test("variance concentrated on one axis pins the component there") {
    // dim 0 swings ±8, dims 1-3 carry small fixed offsets
    val rows = (0 until 40).map { i =>
      Array((if (i % 2 == 0) 8f else -8f), 0.1f * (i % 3),
        0.05f * (i % 5), 0.2f)
    }
    val v = Pca.topComponent(rows.toDF("e"), "e", 4, iters = 4)
      .as[(Int, Double)].collect().toMap
    assert(math.abs(math.abs(v(0)) - 1.0) < 1e-3,
      s"dominant loading not on dim 0: $v")
    (1 to 3).foreach(i =>
      assert(math.abs(v(i)) < 0.05, s"dim $i loading ${v(i)}"))
  }

  test("identical vectors (zero covariance) yield zero loadings, no error") {
    val df = Seq.fill(5)(Array(1f, 2f, 3f)).toDF("e")
    val v = Pca.topComponent(df, "e", 3, iters = 2)
      .as[(Int, Double)].collect().toMap
    assert(v.values.forall(_ === 0.0), s"expected zeros: $v")
  }

  test("empty input yields an empty result") {
    val df = Seq.empty[Array[Float]].toDF("e")
    assert(Pca.topComponent(df, "e", 8, iters = 2).count() === 0L)
  }
}
