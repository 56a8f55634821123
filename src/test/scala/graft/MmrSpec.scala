package graft

import graft.operators.Similarity

/** Unit semantics for [[Similarity.mmrTopK]] (q186): relevance-first
  * pick, the diversity trade-off beating pure relevance, λ extremes,
  * deterministic tie-break, and pool exhaustion.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private val q = Array(1f, 0f)

  // A: duplicate of the query; B: near-duplicate of A; C: orthogonal
  private def pool = Seq(
    (1L, Array(1f, 0f)),      // rel 1.0
    (2L, Array(0.95f, 0.05f)), // rel ~0.999, sim(A,B) ~0.999
    (3L, Array(0f, 1f))        // rel 0.0,   sim(A,C) = 0
  ).toDF("vec_id", "embedding")

  private def mmr(k: Int, lam: Double): List[(Int, Long)] =
    Similarity.mmrTopK(pool, "vec_id", "embedding", q, k, lam)
      .select("rank", "n_id").as[(Int, Long)].collect().toList

  test("first pick is the pure-relevance arg-max at any lambda") {
    assert(mmr(1, 1.0).head._2 === 1L)
    assert(mmr(1, 0.4).head._2 === 1L)
  }

  test("diversity: the orthogonal vector beats the near-duplicate") {
    // step 2 at λ=0.4: B scores 0.4·0.999 − 0.6·0.999 < 0,
    // C scores 0.4·0 − 0.6·0 = 0 → C wins despite zero relevance;
    // pure relevance (λ=1) would rank B second
    assert(mmr(3, 0.4).map(_._2) === List(1L, 3L, 2L))
    assert(mmr(3, 1.0).map(_._2) === List(1L, 2L, 3L))
  }

  test("k beyond the pool returns the whole pool, ranked") {
    val r = mmr(10, 0.7)
    assert(r.map(_._1) === List(1, 2, 3))
    assert(r.map(_._2).toSet === Set(1L, 2L, 3L))
  }

  test("score ties break to the smallest id") {
    val tied = Seq((7L, Array(1f, 0f)), (5L, Array(1f, 0f)),
      (9L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val r = Similarity.mmrTopK(tied, "vec_id", "embedding", q,
        k = 1, lam = 1.0)
      .select("n_id").as[Long].collect()
    assert(r.toList === List(5L))
  }

  test("empty pool yields an empty result") {
    val empty = spark.emptyDataFrame
      .selectExpr("CAST(1 AS BIGINT) AS vec_id",
        "array(CAST(1.0 AS FLOAT)) AS embedding")
      .limit(0)
    assert(Similarity.mmrTopK(empty, "vec_id", "embedding",
      Array(1f), 3, 0.7).count() === 0)
  }

  // ---- farthest-first k-center (q218) ----

  private def ff(vecs: Seq[(Long, Array[Float])], k: Int)
      : Seq[(Int, Long, Double)] =
    Similarity.farthestFirst(vecs.toDF("id", "e"), "id", "e", k)
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)

  /** Driver-side reference of the same greedy. */
  private def ffRef(vecs: Seq[(Long, Array[Float])], k: Int)
      : (Seq[Long], Double) = {
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
      }.sum
    val sorted = vecs.sortBy(_._1)
    var picked = Seq(sorted.head)
    while (picked.size < k) {
      val rest = sorted.filterNot(v => picked.exists(_._1 == v._1))
      val next = rest.maxBy(v =>
        (picked.map(c => d2(v._2, c._2)).min, -v._1))
      picked = picked :+ next
    }
    val radius = sorted
      .map(v => picked.map(c => d2(v._2, c._2)).min).max
    (picked.map(_._1), radius)
  }

  test("farthest-first: line of points picks the extremes first") {
    // ids on a line at x = 0, 1, 2, 10: seed 1 (id 1, x=0), then
    // x=10, then x=2 (dist 2^2=4 to {0}... min(4, 64)=4 beats x=1's 1)
    val vs = Seq(1L -> Array(0f), 2L -> Array(1f), 3L -> Array(2f),
      4L -> Array(10f))
    val got = ff(vs, 3)
    assert(got.map(_._2) === Seq(1L, 4L, 3L, -1L))
    assert(got(1)._3 === 100.0) // 10^2 from the seed
    assert(got(2)._3 === 4.0)
    // radius after {0, 10, 2}: worst point is x=1 at d2 = 1
    assert(got(3)._3 === 1.0)
  }

  test("farthest-first: matches the driver-side greedy on hashed vectors") {
    val vs = (1L to 40L).map(i => i -> Array.tabulate(4)(j =>
      (((i * 2654435761L + j * 40503L) % 97).toFloat / 97f)))
    val got = ff(vs, 7)
    val (ids, radius) = ffRef(vs, 7)
    assert(got.take(7).map(_._2) === ids)
    assert(math.abs(got.last._3 - radius) < 1e-12)
  }

  test("farthest-first: k = 1 is just the seed plus radius") {
    val vs = Seq(5L -> Array(1f, 1f), 9L -> Array(4f, 5f))
    val got = ff(vs, 1)
    assert(got.map(_._2) === Seq(5L, -1L))
    assert(got(1)._3 === 25.0) // (3^2 + 4^2)
  }
}
