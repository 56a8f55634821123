package graft

import graft.operators.{Cooccur, PageRank}

/** Unit semantics for [[Cooccur.itemSimilarity]] (q194) and
  * [[PageRank.personalizedRanks]] (q195): hand-computed cosine
  * neighbor ranking, duplicate/skew guards, and the integer PPR
  * round algebra with mass conservation.
  */
class CooccurPprSpec extends SparkSpec {
  import spark.implicits._

  private def sim(rows: Seq[(Long, String)], topK: Int,
      maxBasket: Int = 0) =
    Cooccur.itemSimilarity(rows.toDF("bk", "it"), "bk", "it",
        topK, maxBasket)
      .orderBy("item", "rank")
      .select("item", "neighbor", "c_pair", "cos", "rank")
      .as[(String, String, Long, Double, Int)].collect().toList

  private val baskets = Seq(
    (1L, "A"), (1L, "B"),
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "C"))

  test("hand-computed cosine: c_A=3 c_B=2 c_C=1, AB=2, AC=1") {
    val r = sim(baskets, topK = 2)
    val a = r.filter(_._1 == "A")
    // cos(A,B) = 2/√6 = .816497, cos(A,C) = 1/√3 = .577350
    assert(a.map(x => (x._2, x._3, x._4, x._5)) ===
      List(("B", 2L, 0.816497, 1), ("C", 1L, 0.57735, 2)))
    // B sees only A; C sees only A
    assert(r.filter(_._1 == "B").map(_._2) === List("A"))
    assert(r.filter(_._1 == "C").map(_._2) === List("A"))
  }

  test("duplicate basket rows do not inflate counts") {
    val r = sim(baskets ++ Seq((1L, "A"), (1L, "B"), (1L, "B")),
      topK = 2)
    assert(r.filter(_._1 == "A").head._3 === 2L)
  }

  test("topK truncates and equal scores break to smaller neighbor") {
    // D co-occurs once with each of E,F (singleton elsewhere):
    // cos(D,E) == cos(D,F) → E first; topK=1 keeps only E
    val rows = Seq((10L, "D"), (10L, "E"), (11L, "D"), (11L, "F"),
      (12L, "E"), (12L, "F"))
    val d = sim(rows, topK = 1).filter(_._1 == "D")
    assert(d.map(_._2) === List("E"))
  }

  test("maxBasket drops oversized baskets whole") {
    val big = (1 to 5).map(i => (9L, s"X$i"))
    val r = sim(baskets ++ big, topK = 3, maxBasket = 4)
    assert(r.forall(x => !x._1.startsWith("X")))
    // and the small baskets still count
    assert(r.filter(_._1 == "A").head._3 === 2L)
  }

  // ---- personalized PageRank ----

  private def ppr(iters: Int) = {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val sources = Seq(1L).toDF("id")
    PageRank.personalizedRanks(edges, "src", "dst", sources, iters)
      .orderBy("id").as[(Long, Long)].collect().toList
  }

  test("one hand-computed round on the path graph 1-2-3, seed {1}") {
    // nV=3 nS=1 → base(1) = 450000; outdeg 1,2,1; r0 = 1e6 each
    // r1(1) = 450000 + 85·(1e6 div 2) div 100 = 875000
    // r1(2) = 85·(1e6 + 1e6) div 100 = 1700000
    // r1(3) = 85·(1e6 div 2) div 100 = 425000
    assert(ppr(1) === List((1L, 875000L), (2L, 1700000L),
      (3L, 425000L)))
  }

  test("teleport keeps total mass at |V|·1e6 (up to div truncation)") {
    for (it <- Seq(1, 2, 4)) {
      val total = ppr(it).map(_._2).sum
      assert(total >= 2999990L && total <= 3000000L,
        s"iters=$it mass $total")
    }
  }

  test("mass concentrates at the seed vs uniform PageRank") {
    val r = ppr(4).toMap
    assert(r(1L) > r(3L))
  }

  test("sources absent from the graph are rejected") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      PageRank.personalizedRanks(edges, "src", "dst",
        Seq(99L).toDF("id"), 1)
    }
  }

  test("non-symmetric edges: a zero-in-degree seed keeps its row " +
      "and teleport mass every round") {
    // 1 → 2 → 3, nothing points at 1 (reachable via the SQL table
    // function, which takes raw directed edges). Vertex set = src-
    // appearing vertices {1, 2} → nV=2; seed {1}: base(1) =
    // 150000·2 div 1 = 300000. Vertex 1 must appear with exactly
    // the teleport mass each round, not vanish from the groupBy(dst)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    for (it <- Seq(1, 3)) {
      val r = PageRank.personalizedRanks(edges, "src", "dst",
          Seq(1L).toDF("id"), it)
        .orderBy("id").as[(Long, Long)].collect().toList
      assert(r.map(_._1) === List(1L, 2L), s"iters=$it rows $r")
      assert(r.head._2 === 150000L * 2L, s"iters=$it seed mass $r")
    }
  }
}
