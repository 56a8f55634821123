package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Unit semantics for [[Graph.directedHops]] and [[Graph.sccOfPivot]]
  * (q210): direction is respected, the forward-backward intersection
  * is exactly the pivot's SCC, and tails/truncation behave as
  * documented.
  */
class SccSpec extends SparkSpec {
  import spark.implicits._

  private def scc(edges: Seq[(Long, Long)], pivot: Long, hops: Int)
      : Map[Long, (Option[Int], Option[Int])] =
    Graph.sccOfPivot(edges.toDF("s", "t"), "s", "t", pivot, hops)
      .as[(Long, Option[Int], Option[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  private def members(m: Map[Long, (Option[Int], Option[Int])]) =
    m.filter(kv => kv._2._1.isDefined && kv._2._2.isDefined).keySet

  test("directed hops respect edge direction") {
    val hops = Graph.directedHops(
        Seq((1L, 2L), (2L, 3L), (4L, 1L)).toDF("s", "t"),
        "s", "t", pivot = 1L, maxHops = 5)
      .as[(Long, Int)].collect().toMap
    // 4 points INTO 1 and must not be reached forward
    assert(hops === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("cycle with an out-tail and an in-tail: SCC is the cycle only") {
    // cycle 1→2→3→1; out-tail 3→9; in-tail 8→1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 9L), (8L, 1L))
    val m = scc(e, pivot = 1L, hops = 6)
    assert(members(m) === Set(1L, 2L, 3L))
    assert(m(9L)._1.isDefined && m(9L)._2.isEmpty)  // fwd-only
    assert(m(8L)._2.isDefined && m(8L)._1.isEmpty)  // bwd-only
  }

  test("two cycles bridged one-way: pivot's side only") {
    // A: 1→2→1, B: 10→11→10, bridge 2→10
    val e = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L), (2L, 10L))
    assert(members(scc(e, 1L, 6)) === Set(1L, 2L))
    assert(members(scc(e, 10L, 6)) === Set(10L, 11L))
  }

  test("DAG pivot: SCC is the pivot alone") {
    val m = scc(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 1L, 4)
    assert(members(m) === Set(1L))
  }

  test("hop cap truncation is visible as cap-hop rows") {
    // 6-cycle, cap at 3: backward search can't close the loop fully
    val e = (0L to 5L).map(i => (i, (i + 1) % 6))
    val m = scc(e, 0L, 3)
    // forward reaches 0,1,2,3; backward reaches 0,5,4,3; SCC found
    // only where both overlap within the cap
    assert(members(m) === Set(0L, 3L))
    // the sentinel the q210 digest hashes: first-visits AT the cap
    assert(m.values.exists(v => v._1.contains(3)) &&
      m.values.exists(v => v._2.contains(3)))
    // with enough hops the full cycle is one SCC, no cap visits
    val full = scc(e, 0L, 6)
    assert(members(full) === (0L to 5L).toSet)
    assert(!full.values.exists(v =>
      v._1.contains(6) || v._2.contains(6)))
  }

  test("self-loops are dropped and never fake an SCC") {
    val m = scc(Seq((1L, 1L), (1L, 2L)), 1L, 3)
    assert(members(m) === Set(1L))
  }
}
