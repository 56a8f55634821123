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

  // ---- full decomposition: Graph.sccLabels (q213) ----

  private def labels(edges: Seq[(Long, Long)])
      : Map[Long, Long] =
    Graph.sccLabels(edges.toDF("s", "t"), "s", "t")
      .as[(Long, Long)].collect().toMap

  /** Iterative Tarjan — ground-truth SCC labels (min member id). */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.filter(e => e._1 != e._2).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .filter(x => edges.exists(e =>
        (e._1 == x || e._2 == x) && e._1 != e._2))
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.Stack.empty[Long]
    val out = scala.collection.mutable.Map.empty[Long, Long]
    var counter = 0
    def strongconnect(v0: Long): Unit = {
      // explicit work stack (node, remaining successors)
      val work = scala.collection.mutable.Stack[(Long, List[Long])](
        (v0, adj.getOrElse(v0, Seq.empty).toList))
      index(v0) = counter; low(v0) = counter; counter += 1
      stack.push(v0); onStack += v0
      while (work.nonEmpty) {
        val (v, succs) = work.pop()
        succs match {
          case w :: rest =>
            work.push((v, rest))
            if (!index.contains(w)) {
              index(w) = counter; low(w) = counter; counter += 1
              stack.push(w); onStack += w
              work.push((w, adj.getOrElse(w, Seq.empty).toList))
            } else if (onStack(w)) low(v) = math.min(low(v), index(w))
          case Nil =>
            if (low(v) == index(v)) {
              val comp = scala.collection.mutable.Buffer.empty[Long]
              var w = -1L
              while ({ w = stack.pop(); onStack -= w; comp += w
                       w != v }) ()
              val m = comp.min
              comp.foreach(u => out(u) = m)
            }
            if (work.nonEmpty) {
              val (p, _) = work.top
              low(p) = math.min(low(p), low(v))
            }
        }
      }
    }
    vs.foreach(v => if (!index.contains(v)) strongconnect(v))
    out.toMap
  }

  test("sccLabels: cycles, tails, bridges match Tarjan") {
    val e = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),      // cycle A
      (10L, 11L), (11L, 10L),            // cycle B
      (3L, 10L),                         // one-way bridge A -> B
      (20L, 1L), (21L, 20L),             // in-tail
      (11L, 30L), (30L, 31L))            // out-tail
    assert(labels(e) === tarjan(e))
  }

  test("sccLabels: pure DAG is all singletons") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val l = labels(e)
    assert(l === e.flatMap(x => Seq(x._1, x._2)).distinct
      .map(v => v -> v).toMap)
  }

  test("sccLabels: one big strongly connected doubling graph") {
    val n = 32L
    val e = (0L until n).flatMap(v =>
      Seq((v, (2 * v) % n), (v, (2 * v + 1) % n)))
    val l = labels(e)
    assert(l.values.toSet === Set(0L))
    assert(l.keySet === (0L until n).toSet)
  }

  test("sccLabels: nested SCC DAG needs multiple outer rounds") {
    // chain of three 2-cycles, each bridged one-way into the next —
    // SCC-DAG depth 3 exercises the outer peel loop
    val e = Seq((1L, 2L), (2L, 1L), (2L, 5L),
      (5L, 6L), (6L, 5L), (6L, 9L),
      (9L, 10L), (10L, 9L))
    assert(labels(e) === tarjan(e))
  }

  test("sccLabels: matches Tarjan on a pseudo-random dense graph") {
    // deterministic hashed edges over 40 vertices
    val e = (0 until 160).map { i =>
      val a = (i * 2654435761L) % 40
      val b = (i * 40503L + 17) % 40
      (a, b)
    }.filter(p => p._1 != p._2).distinct
    assert(labels(e) === tarjan(e))
  }

  test("sccLabels: empty and self-loop-only inputs settle to empty") {
    assert(labels(Seq((7L, 7L))).isEmpty)
  }
}
