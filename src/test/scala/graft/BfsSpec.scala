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
}
