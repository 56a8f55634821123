package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Unit semantics for [[Graph.bfsHops]] (q171): min-hop labels,
  * multi-source behavior, hop bound, and isolated vertices.
  */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  // path 1-2-3-4-5 plus a triangle 10-11-12 and isolated 99 via
  // sources only
  private def edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")

  private def hops(srcs: Seq[Long], maxHops: Int) =
    Graph.bfsHops(edges, "a", "b", srcs.toDF("id"), "id", maxHops)
      .as[(Long, Int)].collect().toMap

  test("single source labels min hop along the path") {
    val h = hops(Seq(1L), 10)
    assert(h === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("maxHops bounds the expansion") {
    val h = hops(Seq(1L), 2)
    assert(h === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("multi-source takes the minimum over sources") {
    val h = hops(Seq(1L, 5L), 10)
    assert(h(3L) === 2 && h(2L) === 1 && h(4L) === 1)
  }

  test("a source outside the edge set stays hop 0 and expands nowhere") {
    val h = hops(Seq(99L), 10)
    assert(h === Map(99L -> 0))
  }

  test("undirected: expansion crosses edges in both directions") {
    val h = hops(Seq(12L), 10)
    assert(h === Map(12L -> 0, 10L -> 1, 11L -> 1))
  }

  private def sp(we: Seq[(Long, Long, Long)], srcs: Seq[Long],
      maxEdges: Int) =
    Graph.boundedShortestPaths(we.toDF("a", "b", "w"), "a", "b", "w",
      srcs.toDF("id"), "id", maxEdges)
      .as[(Long, Long)].collect().toMap

  test("weighted: a longer-hop cheap path beats the direct edge") {
    // 1→3 direct costs 100; 1→2→3 costs 1+1=2
    val d = sp(Seq((1L, 3L, 100L), (1L, 2L, 1L), (2L, 3L, 1L)),
      Seq(1L), 4)
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("weighted: the edge bound can force the expensive route") {
    val d = sp(Seq((1L, 3L, 100L), (1L, 2L, 1L), (2L, 3L, 1L)),
      Seq(1L), 1)
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 100L))
  }

  test("weighted: multi-source takes the cheaper origin") {
    val d = sp(Seq((1L, 2L, 10L), (3L, 2L, 1L)), Seq(1L, 3L), 4)
    assert(d(2L) === 1L)
  }

  test("weighted: convergence exits early with an identical result") {
    // diameter-3 path: labels stabilize after 3 productive rounds,
    // one more detects the fixed point — 50 budgeted rounds must
    // cost 4, and the labels must equal the exact-bound run
    val we = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L))
    val (df, rounds) = Graph.boundedShortestPathsWithRounds(
      we.toDF("a", "b", "w"), "a", "b", "w", Seq(1L).toDF("id"),
      "id", 50)
    assert(rounds === 4, s"expected early exit after 4 rounds, ran $rounds")
    assert(df.as[(Long, Long)].collect().toMap ===
      sp(we, Seq(1L), 3))
  }

  test("weighted: a tighter bound than the diameter still runs all budgeted rounds") {
    val we = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L))
    val (_, rounds) = Graph.boundedShortestPathsWithRounds(
      we.toDF("a", "b", "w"), "a", "b", "w", Seq(1L).toDF("id"),
      "id", 2)
    assert(rounds === 2)
  }

  // ---- link prediction (q220) ----

  private def lp(es: Seq[(Long, Long)], cap: Int)
      : Map[(Long, Long), (Long, Long, Long)] =
    Graph.commonNeighborCandidates(es.toDF("a", "b"), "a", "b", cap)
      .select("u", "v", "cn", "pa_u_deg", "pa_v_deg")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  private def ra(es: Seq[(Long, Long)], cap: Int)
      : Map[(Long, Long), Long] =
    Graph.commonNeighborCandidates(es.toDF("a", "b"), "a", "b", cap)
      .select("u", "v", "ra_ppm")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("common neighbors: non-edges score, existing edges are excluded") {
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) each share 2
    // common neighbors; the square's own edges must NOT appear
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val m = lp(es, cap = 10)
    assert(m.keySet === Set((1L, 3L), (2L, 4L)))
    assert(m((1L, 3L)) === ((2L, 2L, 2L)))
    assert(m((2L, 4L)) === ((2L, 2L, 2L)))
  }

  test("cn counts length-2 paths exactly; degrees ride along") {
    // star center 9 with leaves 1,2,3 and an extra edge 1-2:
    // non-edges (1,3),(2,3) have cn=1 via 9; (1,2) is an edge
    val es = Seq((9L, 1L), (9L, 2L), (9L, 3L), (1L, 2L))
    val m = lp(es, cap = 10)
    assert(m.keySet === Set((1L, 3L), (2L, 3L)))
    assert(m((1L, 3L)) === ((1L, 2L, 1L))) // deg(1)=2, deg(3)=1
  }

  test("degree cap excludes hub midpoints AND hub endpoints") {
    // hub 9 connects 1..5 (deg 5); with cap 2 the hub is excluded,
    // so the hub-mediated pairs vanish; triangle path 20-21, 21-22
    // (all deg <= 2) still yields (20,22)
    val es = (1L to 5L).map(i => (9L, i)) ++
      Seq((20L, 21L), (21L, 22L))
    val capped = lp(es, cap = 2)
    assert(capped.keySet === Set((20L, 22L)))
    // with a generous cap the hub pairs appear: C(5,2) = 10 pairs
    assert(lp(es, cap = 10).keySet.size === 10 + 1)
  }

  test("adaptive cap: p99-derived bound tracks the bulk and " +
      "excludes only the out-of-distribution hub") {
    // 120 deg<=2 chain vertices (the bulk) + one deg-40 hub: exact
    // p99(deg) = 2, cap = max(2*4, minCap=4) = 8 < 40 -> the hub is
    // excluded exactly like a hand-picked cap would, but DERIVED.
    val chain = (0L until 120L).map(i => (1000L + i, 1001L + i))
    val hub = (1L to 40L).map(i => (9L, 2000L + i))
    val got = Graph.commonNeighborCandidatesAdaptive(
        (chain ++ hub).toDF("a", "b"), "a", "b",
        p99Mult = 4, minCap = 4)
      .select("u", "v").as[(Long, Long)].collect().toSet
    // chain contributes (i, i+2) pairs only; zero hub-mediated pairs
    assert(got === (0L until 119L).map(i =>
      (1000L + i, 1002L + i)).toSet)
    // with everything under the derived cap, results == fixed-cap
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val adaptive = Graph.commonNeighborCandidatesAdaptive(
        es.toDF("a", "b"), "a", "b")
      .select("u", "v", "cn").as[(Long, Long, Long)].collect().toSet
    val fixed = Graph.commonNeighborCandidates(
        es.toDF("a", "b"), "a", "b", 64)
      .select("u", "v", "cn").as[(Long, Long, Long)].collect().toSet
    assert(adaptive === fixed)
  }

  test("orientation and duplicate edges do not double-count") {
    val m = lp(Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L)), cap = 5)
    assert(m === Map((1L, 3L) -> ((1L, 1L, 1L))))
  }

  test("resource allocation: cheap midpoints outrank hubs, exact " +
      "integer ppm") {
    // (1,3) share midpoint 2 (deg 2 -> 500000 ppm); (4,6) share
    // midpoint 5, a deg-4 hub (-> 250000 ppm); (7,9) share TWO
    // midpoints 8 (deg 2) and 10 (deg 4) -> 500000 + 250000
    val es = Seq((1L, 2L), (2L, 3L),
      (4L, 5L), (5L, 6L), (5L, 11L), (5L, 12L),
      (7L, 8L), (8L, 9L), (7L, 10L), (10L, 9L),
      (10L, 13L), (10L, 14L))
    val m = ra(es, cap = 10)
    assert(m((1L, 3L)) === 500000L)
    assert(m((4L, 6L)) === 250000L)
    assert(m((7L, 9L)) === 750000L)
    // RA reorders vs CN: (1,3) has cn=1 like (4,6) but higher RA
    val cn = lp(es, cap = 10)
    assert(cn((1L, 3L))._1 === cn((4L, 6L))._1)
    assert(m((1L, 3L)) > m((4L, 6L)))
  }
}
