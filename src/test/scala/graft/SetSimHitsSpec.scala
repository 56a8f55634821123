package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PageRank}

/** Unit semantics for [[Dedup.prefixFilterPairs]] (q203) and
  * [[PageRank.integerHits]] (q204).
  *
  * The set-sim join's headline claim — the prefix filter loses NO
  * qualifying pair — is checked against the brute-force all-pairs
  * baseline on corpora with engineered Jaccard values, including
  * exact-threshold ties. HITS is checked against an independent
  * in-test reimplementation of the integer recurrence on hand-built
  * graphs (bipartite, star, chain).
  */
class SetSimHitsSpec extends SparkSpec {
  import spark.implicits._

  // ---- prefixFilterPairs ----

  private def pairsOf(docs: Seq[(Long, String)], tauPpm: Long)
      : Set[(Long, Long, Long, Long, Long)] =
    Dedup.prefixFilterPairs(docs.toDF("doc_id", "text"), "doc_id",
        "text", n = 3, tauPpm = tauPpm)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  private def bruteOf(docs: Seq[(Long, String)], tau: Double)
      : Set[(Long, Long)] =
    Dedup.shingleJaccard(docs.toDF("doc_id", "text"), "doc_id",
        "text", n = 3, minJaccard = tau)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet

  // doc 1/2: 10 tokens sharing 9 → 8 shingles sharing 7
  //   (J = 7/9 ≈ 0.778); doc 3 disjoint; doc 4 = doc 1 exactly;
  // doc 5 too short for any shingle
  private val corpus = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "a b c d e f g h i X"),
    (3L, "p q r s t u v w x y"),
    (4L, "a b c d e f g h i j"),
    (5L, "a b"))

  test("prefix filter finds exactly the brute-force pairs") {
    val got = pairsOf(corpus, 600000L).map(p => (p._1, p._2))
    assert(got == bruteOf(corpus, 0.6))
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("exact pair carries inter == uni and jacc_ppm == 1e6") {
    val exact = pairsOf(corpus, 600000L)
      .find(p => p._1 == 1L && p._2 == 4L).get
    assert(exact._3 == exact._4 && exact._5 == 1000000L)
  }

  test("integer ppm values are exact (7 of 9 shared shingles)") {
    val p = pairsOf(corpus, 600000L)
      .find(p => p._1 == 1L && p._2 == 2L).get
    assert(p == ((1L, 2L, 7L, 9L, 7L * 1000000L / 9L)))
  }

  test("pair exactly AT the threshold is kept, just below is dropped") {
    // J = 7/9 = 777777 ppm (truncated): kept at tauPpm = 777777,
    // dropped at 777778
    val at = pairsOf(corpus, 777777L).map(p => (p._1, p._2))
    assert(at.contains((1L, 2L)))
    val above = pairsOf(corpus, 777778L).map(p => (p._1, p._2))
    assert(!above.contains((1L, 2L)))
    assert(above.contains((1L, 4L))) // the exact duplicate survives
  }

  test("sub-shingle docs never pair, and never crash the join") {
    val got = pairsOf(Seq((1L, "x y"), (2L, "x y"), (3L, "")), 100000L)
    assert(got.isEmpty)
  }

  test("no-false-negative holds on a shifted-dup corpus vs brute force") {
    val base = Tables.documents(spark, sf()).limit(120)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val got = pairsOf(base, 600000L).map(p => (p._1, p._2))
    assert(got == bruteOf(base, 0.6))
  }

  test("opt-in suffix filter is a pure pre-gate: identical output") {
    // the PPJoin+ suffix filter may only skip work, never change the
    // result — on the engineered corpus (exact dup, threshold ties,
    // disjoint docs) and on real documents
    def both(docs: Seq[(Long, String)], tau: Long) = {
      def run(sf: Boolean) = Dedup.prefixFilterPairs(
          docs.toDF("doc_id", "text"), "doc_id", "text", n = 3,
          tauPpm = tau, suffixFilter = sf)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(run(true) == run(false), s"tau=$tau")
    }
    both(corpus, 600000L)
    both(corpus, 777777L)
    val base = Tables.documents(spark, sf()).limit(120)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    both(base, 600000L)
  }

  // ---- integerHits ----

  /** Independent reimplementation of the exact integer recurrence. */
  private def refHits(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val e = edges.distinct
    var h = e.map(_._1).distinct.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val ar = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(x => h(x._1)).sum }
      val amx = ar.values.max
      a = ar.map { case (k, v) => k -> v * 1000000L / amx }
      val hr = e.groupBy(_._1).map { case (s, es) =>
        s -> es.map(x => a(x._2)).sum }
      val hmx = hr.values.max
      h = hr.map { case (k, v) => k -> v * 1000000L / hmx }
    }
    (h, a)
  }

  private def runHits(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val (hd, ad) = PageRank.integerHits(
      edges.toDF("s", "t"), "s", "t", iters,
      broadcastScores = Some(true))
    (hd.as[(Long, Long)].collect().toMap,
      ad.as[(Long, Long)].collect().toMap)
  }

  test("hits matches the reference recurrence on a bipartite graph") {
    // customers 1-3 → parts 11-13; 3 is the super-hub
    val e = Seq((1L, 11L), (1L, 12L), (2L, 11L),
      (3L, 11L), (3L, 12L), (3L, 13L))
    for (it <- 1 to 3) assert(runHits(e, it) == refHits(e, it),
      s"iters=$it")
  }

  test("hits: star center is the max authority at exactly 1e6") {
    val e = Seq((1L, 99L), (2L, 99L), (3L, 99L), (3L, 4L))
    val (_, a) = runHits(e, 2)
    assert(a(99L) == 1000000L && a(4L) < 1000000L)
  }

  test("hits matches reference on a directed chain with a cycle") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    for (it <- 1 to 3) assert(runHits(e, it) == refHits(e, it),
      s"iters=$it")
  }

  test("hits: duplicate edges are deduped") {
    val e = Seq((1L, 2L), (1L, 2L), (3L, 2L))
    assert(runHits(e, 2) == refHits(e, 2))
  }

  test("hits is exact past int64: 10M-edge star whose raw rescale " +
      "product exceeds Long.Max") {
    // 10M hubs all pointing at vertex 0: round-1 raw authority sum is
    // 1e7·1e6 = 1e13, and the max-rescale multiplies by 1e6 again —
    // 1e19 > Long.Max (~9.2e18). An int64 chain wraps negative here;
    // the decimal(38,0) chain must stay exact. A second authority
    // (half the hubs) checks the truncated div, not just the max row.
    val spark = this.spark
    import spark.implicits._
    val n = 10000000L
    val star = spark.range(1L, n + 1L)
      .select(col("id").as("s"), lit(0L).as("t"))
    val half = spark.range(1L, n / 2 + 1L)
      .select(col("id").as("s"), lit(-1L).as("t"))
    val (hd, ad) = PageRank.integerHits(
      star.unionAll(half).toDF, "s", "t", iters = 1,
      broadcastScores = Some(false))
    val a = ad.as[(Long, Long)].collect().toMap
    assert(a(0L) == 1000000L, s"star center rescales to 1e6: $a")
    // exact: (5e12 · 1e6) div 1e13 = 500000 — a wrapped int64 sum
    // lands anywhere but here
    assert(a(-1L) == 500000L, s"half-degree authority exact: $a")
    val h = hd.as[(Long, Long)].collect()
    assert(h.forall { case (_, v) => v >= 0L && v <= 1000000L })
    assert(PageRank.hitsOverflowWitness(ad.unionAll(hd)).count() == 0L)
  }

  test("overflow witness flags null and out-of-range scores") {
    val spark = this.spark
    import spark.implicits._
    val ok = Seq((1L, Some(0L)), (2L, Some(1000000L)))
    val bad = Seq((3L, None), (4L, Some(-1L)), (5L, Some(1000001L)))
    val df = (ok ++ bad).toDF("id", "v")
    val flagged = PageRank.hitsOverflowWitness(df)
      .select("id").as[Long].collect().toSet
    assert(flagged == Set(3L, 4L, 5L))
  }

  test("hits: scores stay within [0, 1e6]") {
    val e = (1L to 40L).flatMap(c => (1L to (c % 7 + 1))
      .map(p => (c, 100L + p)))
    val (h, a) = runHits(e, 2)
    assert((h.values ++ a.values).forall(v => v >= 0L && v <= 1000000L))
    assert(h.values.max == 1000000L && a.values.max == 1000000L)
  }
}
