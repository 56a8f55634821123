package graft

import org.apache.spark.sql.functions._
import graft.operators.{EntityRes, Graph}

/** Unit semantics for [[EntityRes.sortedNeighborhoodPairs]] (q214)
  * and [[Graph.earliestArrival]] (q215): the distributed rank must
  * equal the single-node rank, window pairs must appear exactly
  * once, and temporal arrivals must respect edge times.
  */
class SnmTemporalSpec extends SparkSpec {
  import spark.implicits._

  private def snm(rows: Seq[(Long, String)], w: Int)
      : Seq[(Long, Long, Long)] =
    EntityRes.sortedNeighborhoodPairs(
        rows.toDF("id", "k"), "id", "k", w)
      .select(col("a"), col("b"), col("dist"))
      .as[(Long, Long, Long)].collect().toSeq

  /** Reference: sort by (key, id), all pairs within window w. */
  private def ref(rows: Seq[(Long, String)], w: Int)
      : Seq[(Long, Long, Long)] = {
    val sorted = rows.sortBy(r => (r._2, r._1)).map(_._1)
    for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + w, sorted.length)
    } yield (sorted(i), sorted(j), (j - i).toLong)
  }

  test("SNM: pairs match the single-node reference, exactly once") {
    val rows = Seq(5L -> "delta", 1L -> "alpha", 9L -> "echo",
      3L -> "bravo", 7L -> "charlie", 2L -> "alpha")
    val got = snm(rows, 3)
    assert(got.sorted === ref(rows, 3).sorted)
    assert(got.distinct.size === got.size)
  }

  test("SNM: candidate count is exactly (w-1)*n - w*(w-1)/2") {
    val rows = (1L to 100L).map(i => i -> f"k$i%05d")
    val got = snm(rows, 5)
    assert(got.size === 4 * 100 - 10)
    // every dist 1..4 appears, none >= 5
    assert(got.map(_._3).toSet === Set(1L, 2L, 3L, 4L))
  }

  test("SNM: skewed duplicate keys cannot blow up the window") {
    // 50 records with the IDENTICAL key: a key-equi block would emit
    // 1225 pairs; the positional window emits exactly (w-1)*n - ...
    val rows = (1L to 50L).map(i => i -> "same")
    val got = snm(rows, 4)
    assert(got.size === 3 * 50 - 6)
    assert(got.sorted === ref(rows, 4).sorted)
  }

  test("SNM: many partitions still produce a correct global rank") {
    // force several range partitions with a big sorted input
    val rows = (1L to 2000L).map(i => i -> f"key$i%06d")
    assert(snm(rows, 2).sorted === ref(rows, 2).sorted)
  }

  // ---- temporal earliest arrival ----

  private def reach(edges: Seq[(Long, Long, Long)], src: Long,
      rounds: Int = 8): Map[Long, (Long, Option[Long])] =
    Graph.earliestArrival(edges.toDF("s", "t", "at"), "s", "t", "at",
        src, rounds)
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("temporal: arrival respects time order along the path") {
    // 1->2 at t=10; 2->3 only at t=5 (BEFORE arrival) and t=20
    val e = Seq((1L, 2L, 10L), (2L, 3L, 5L), (2L, 3L, 20L))
    val m = reach(e, 1L)
    assert(m(1L)._1 === 0L)
    assert(m(2L)._1 === 10L)
    assert(m(3L)._1 === 20L) // the t=5 instance is unusable
  }

  test("temporal: simultaneous hops chain (non-strict >=)") {
    val e = Seq((1L, 2L, 7L), (2L, 3L, 7L))
    assert(reach(e, 1L)(3L)._1 === 7L)
  }

  test("temporal: a structurally-reachable vertex can be temporally unreachable") {
    // 2->3 exists only strictly before anything reaches 2
    val e = Seq((1L, 2L, 10L), (2L, 3L, 9L))
    val m = reach(e, 1L)
    assert(!m.contains(3L))
  }

  test("temporal: waiting on a cycle is never needed for earliest arrival") {
    // direct 1->3 at 50; via 2: 1->2 at 5, 2->3 at 8 beats it
    val e = Seq((1L, 3L, 50L), (1L, 2L, 5L), (2L, 3L, 8L))
    assert(reach(e, 1L)(3L)._1 === 8L)
  }

  test("temporal: fixpoint witness equals final arrival when converged") {
    val e = Seq((1L, 2L, 3L), (2L, 3L, 4L), (3L, 4L, 9L))
    val m = reach(e, 1L, rounds = 8)
    assert(m.values.forall(v => v._2.contains(v._1)))
  }

  test("temporal: pre-fixpoint truncation is visible in the witness") {
    // path needs 3 hops; 1 round leaves vertex 2 freshly discovered
    val e = Seq((1L, 2L, 3L), (2L, 3L, 4L), (3L, 4L, 9L))
    val m = reach(e, 1L, rounds = 1)
    assert(m(2L)._2.isEmpty) // first reached in the final round
    assert(!m.contains(3L) && !m.contains(4L))
  }
}
