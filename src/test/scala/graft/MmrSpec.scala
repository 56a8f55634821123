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
}
