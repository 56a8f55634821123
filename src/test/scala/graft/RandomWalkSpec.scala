package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Unit semantics for [[Graph.randomWalks]] (q199): shape (steps+1
  * rows per walk, walksPerNode walks per start), validity (every
  * transition is a real edge), forced moves on degree-1 vertices,
  * determinism under re-execution and re-partitioning, and absent
  * starts dropped.
  */
class RandomWalkSpec extends SparkSpec {
  import spark.implicits._

  private val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")

  private def walks(starts: Seq[Long], perNode: Int, steps: Int,
      edges: org.apache.spark.sql.DataFrame = path) =
    Graph.randomWalks(edges, "a", "b", starts.toDF("id"), perNode,
        steps)
      .select("start", "walk", "step", "vertex")
      .as[(Long, Long, Int, Long)].collect().toList

  test("shape: walksPerNode walks per start, steps+1 rows each, " +
      "step 0 is the start") {
    val r = walks(Seq(1L, 2L, 3L), perNode = 2, steps = 3)
    assert(r.size === 3 * 2 * 4)
    for (((s, w), rows) <- r.groupBy(t => (t._1, t._2))) {
      assert(rows.map(_._3).sorted === List(0, 1, 2, 3))
      assert(rows.find(_._3 == 0).get._4 === s, s"walk ($s,$w)")
    }
  }

  test("every transition is an existing undirected edge") {
    val edgeSet = Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val r = walks(Seq(1L, 2L, 3L), perNode = 2, steps = 4)
    for (((s, w), rows) <- r.groupBy(t => (t._1, t._2))) {
      val seq = rows.sortBy(_._3).map(_._4)
      seq.sliding(2).foreach { case Seq(u, v) =>
        assert(edgeSet((u, v)), s"walk ($s,$w): $u -> $v not an edge")
      }
    }
  }

  test("degree-1 vertices always move to their only neighbor") {
    val r = walks(Seq(1L), perNode = 3, steps = 1)
    assert(r.filter(_._3 == 1).map(_._4).toSet === Set(2L))
  }

  test("deterministic under re-execution and re-partitioning") {
    val a = walks(Seq(1L, 2L, 3L), 2, 4).sorted
    val b = walks(Seq(1L, 2L, 3L), 2, 4,
      edges = path.repartition(7)).sorted
    assert(a === b && a.nonEmpty)
  }

  test("starts absent from the graph are dropped") {
    val r = walks(Seq(1L, 99L), perNode = 1, steps = 2)
    assert(r.map(_._1).toSet === Set(1L))
  }
}
