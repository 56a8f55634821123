package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Unit semantics for [[Graph.sampledBetweenness]] (q208): the exact
  * integer-ppm bounded-radius Brandes accumulation, checked against a
  * hand-computed path graph and an independent in-test
  * reimplementation on denser graphs.
  */
class BetweennessSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], pivots: Int, hops: Int)
      : Map[Long, Long] =
    Graph.sampledBetweenness(edges.toDF("a", "b"), "a", "b",
        pivots, hops)
      .as[(Long, Long)].collect().toMap

  /** Independent bounded-Brandes in plain Scala (integer ppm). */
  private def ref(edgesIn: Seq[(Long, Long)], pivots: Int, hops: Int)
      : Map[Long, Long] = {
    val sym = edgesIn.flatMap(e => Seq(e, e.swap)).distinct
      .filter(e => e._1 != e._2)
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val roots = sym.map(_._1).distinct.sorted.take(pivots)
    val bet = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for (r <- roots) {
      // forward levels with path counts
      val levels = scala.collection.mutable.ArrayBuffer(
        Map(r -> 1L))
      var visited = Set(r)
      for (_ <- 1 to hops) {
        val next = scala.collection.mutable.Map[Long, Long]()
          .withDefaultValue(0L)
        for ((u, su) <- levels.last; v <- adj.getOrElse(u, Set.empty)
             if !visited.contains(v)) next(v) += su
        levels += next.toMap
        visited ++= next.keySet
      }
      // backward deltas, deepest level = 0
      var deltaNext = levels(hops).map { case (v, _) => v -> 0L }
      for (h <- (hops - 1) to 1 by -1) {
        val d = scala.collection.mutable.Map[Long, Long]()
        for ((u, su) <- levels(h)) {
          val terms = adj.getOrElse(u, Set.empty).toSeq
            .filter(levels(h + 1).contains)
            .map { v =>
              su * (1000000L + deltaNext.getOrElse(v, 0L)) /
                levels(h + 1)(v)
            }
          if (terms.nonEmpty) d(u) = terms.sum
        }
        d.foreach { case (v, x) => bet(v) += x }
        deltaNext = d.toMap
      }
    }
    bet.toMap
  }

  test("path graph 1-2-3: the middle vertex brokers 2e6 ppm") {
    val got = run(Seq((1L, 2L), (2L, 3L)), pivots = 3, hops = 2)
    assert(got === Map(2L -> 2000000L))
  }

  test("star graph: only the center accumulates dependency") {
    val e = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L))
    val got = run(e, pivots = 5, hops = 2)
    assert(got.keySet === Set(9L))
    assert(got(9L) === ref(e, 5, 2)(9L))
  }

  test("matches the reference on a two-triangle bridge graph") {
    // triangles {1,2,3} and {4,5,6} bridged 3-4: the bridge
    // endpoints carry the cross traffic
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    for (h <- 2 to 4) {
      val got = run(e, pivots = 6, hops = h)
      assert(got === ref(e, 6, h).filter(_._2 != 0L) ||
        got === ref(e, 6, h), s"hops=$h got=$got ref=${ref(e, 6, h)}")
    }
  }

  test("matches the reference on a denser hashed graph") {
    val e = (0 until 60).map(i =>
      (((i * 7) % 12).toLong, ((i * 5 + 3) % 12).toLong))
      .filter(p => p._1 != p._2)
    val got = run(e, pivots = 8, hops = 3)
    val want = ref(e, 8, 3)
    assert(got === want.filter(_._2 != 0L) || got === want,
      s"got=$got want=$want")
  }

  test("pivot sampling: only the smallest ids act as sources") {
    // chain 1-2-3-4-5; pivots=1 → only root 1 contributes
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = run(e, pivots = 1, hops = 4)
    // from root 1: δ(2)=(1e6+δ(3)); δ(3)=(1e6+δ(4)); δ(4)=1e6+0
    assert(got === Map(4L -> 1000000L, 3L -> 2000000L,
      2L -> 3000000L))
  }
}
