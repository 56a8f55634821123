package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Unit semantics for [[Graph.modularity]] (q196) and
  * [[Graph.perSourceHops]] (q198): hand-computed Newman scores on
  * the two-triangle bridge graph, degenerate partitions, and
  * per-root BFS distance separation.
  */
class ModularityClosenessSpec extends SparkSpec {
  import spark.implicits._

  // two triangles {1,2,3} and {4,5,6} joined by bridge 3-4
  private val bridge = Seq((1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")

  private def mod(labels: Seq[(Long, Long)]) =
    Graph.modularity(bridge, "a", "b", labels.toDF("id", "label"))
      .orderBy("label")
      .select("label", "n_members", "in_edges", "deg_sum", "q_contrib")
      .as[(Long, Long, Long, Long, Double)].collect().toList

  test("hand-computed: triangle partition on the bridge graph") {
    // 2m = 14 directed rows; each triangle: in = 6, deg_sum = 7
    // Q_c = 6/14 − (7/14)² = 3/7 − 1/4 = 5/28 = 0.178571...
    val r = mod(Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
    assert(r.map(x => (x._1, x._2, x._3, x._4)) ===
      List((1L, 3L, 6L, 7L), (4L, 3L, 6L, 7L)))
    assert(r.map(_._5) === List(0.178571, 0.178571))
  }

  test("everything in one community scores exactly zero") {
    // in = 2m and deg_sum = 2m → 1 − 1 = 0
    val r = mod((1L to 6L).map(_ -> 0L))
    assert(r === List((0L, 6L, 14L, 14L, 0.0)))
  }

  test("anti-community split (each vertex alone) is negative") {
    val r = mod((1L to 6L).map(i => i -> i))
    assert(r.forall(_._5 < 0.0))
    assert(r.forall(_._3 === 0L)) // no internal edges anywhere
  }

  test("community with zero internal edges still appears, filled 0") {
    // label 9 holds the two bridge endpoints 3,4 — they ARE linked,
    // so put 1 and 5 (non-adjacent) in a community instead
    val r = mod(Seq(1L -> 9L, 5L -> 9L, 2L -> 2L, 3L -> 2L,
      4L -> 4L, 6L -> 4L))
    val c9 = r.find(_._1 == 9L).get
    assert(c9._3 === 0L && c9._4 === 4L) // deg(1)+deg(5) = 2+2
  }

  // ---- per-source hops ----

  private def hops(maxHops: Int) =
    Graph.perSourceHops(bridge, "a", "b", Seq(1L, 6L).toDF("id"),
        "id", maxHops)
      .orderBy("root", "id")
      .select("root", "id", "hop")
      .as[(Long, Long, Int)].collect().toList

  test("each root keeps its own distances (no cross-root min)") {
    val r = hops(3).groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    // from 1: 0,1,1,2,3,3 — from 6: mirror
    assert(r(1L) === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2,
      5L -> 3, 6L -> 3))
    assert(r(6L) === Map(6L -> 0, 4L -> 1, 5L -> 1, 3L -> 2,
      2L -> 3, 1L -> 3))
  }

  test("maxHops truncates the reach per root") {
    val r = hops(1)
    assert(r === List((1L, 1L, 0), (1L, 2L, 1), (1L, 3L, 1),
      (6L, 4L, 1), (6L, 5L, 1), (6L, 6L, 0)))
  }
}
