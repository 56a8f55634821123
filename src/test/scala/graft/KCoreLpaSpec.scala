package graft

import graft.operators.Graph

/** Unit semantics for [[Graph.kCore]] (q182) and
  * [[Graph.labelPropagation]] (q183): peel-to-fixpoint with the
  * convergence exit, core degrees, cascade peeling, empty cores, and
  * the deterministic synchronous vote with self-damping + min-label
  * tie-break.
  */
class KCoreLpaSpec extends SparkSpec {
  import spark.implicits._

  // triangle 1-2-3 with a pendant chain 3-4-5: the 2-core is exactly
  // the triangle, and reaching it needs CASCADED peeling (drop 5,
  // which exposes 4, which must then be dropped)
  private def triChain = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
    (4L, 5L)).toDF("a", "b")

  private def core(df: org.apache.spark.sql.DataFrame, k: Int) =
    Graph.kCore(df, "a", "b", k, maxRounds = 20)
      .as[(Long, Long)].collect().toMap

  test("2-core peels the pendant chain down to the triangle") {
    assert(core(triChain, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("cascade needs two rounds; fixpoint detected in three") {
    // round 1 drops 5 (deg 1), round 2 drops the exposed 4, round 3
    // observes no change — the convergence exit stops there even with
    // a 20-round budget
    val (_, rounds) =
      Graph.kCoreWithRounds(triChain, "a", "b", 2, maxRounds = 20)
    assert(rounds === 3)
  }

  test("k above the max degree yields an empty core") {
    assert(core(triChain, 4) === Map.empty)
  }

  test("1-core keeps everything with true degrees") {
    assert(core(triChain, 1) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L))
  }

  test("maxRounds bounds peeling (0 rounds = raw degree filter input)") {
    // with a zero budget no peeling happens: every vertex remains and
    // degrees are those of the full graph
    val (df, rounds) =
      Graph.kCoreWithRounds(triChain, "a", "b", 2, maxRounds = 0)
    assert(rounds === 0)
    assert(df.as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L))
  }

  test("core numbers: triangle is the 2-core, chain degrades to 1") {
    val c = Graph.coreNumbers(triChain, "a", "b", maxK = 3,
        maxRounds = 20)
      .as[(Long, Int)].collect().toMap
    assert(c === Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 1, 5L -> 1))
  }

  test("core numbers cap at maxK (survivors of the last threshold)") {
    val c = Graph.coreNumbers(triChain, "a", "b", maxK = 2,
        maxRounds = 20)
      .as[(Long, Int)].collect().toMap
    // the triangle never peels at threshold 2, so it reports the cap
    assert(c === Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 1, 5L -> 1))
  }

  test("core numbers on a 4-clique with a pendant: clique is 3-core") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 9L)).toDF("a", "b")
    val c = Graph.coreNumbers(k4, "a", "b", maxK = 5, maxRounds = 20)
      .as[(Long, Int)].collect().toMap
    assert(c === Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3, 9L -> 1))
  }

  // two triangles {1,2,3} and {10,11,12} joined by one bridge 3-10
  private def twoTri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
    (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("a", "b")

  private def lpa(df: org.apache.spark.sql.DataFrame, rounds: Int) =
    Graph.labelPropagation(df, "a", "b", rounds)
      .as[(Long, Long)].collect().toMap

  test("LPA keeps the two triangles as distinct communities") {
    // hand-replay: round 1 all-tie votes send 10→3 transiently, but
    // rounds 2-3 the triangle majorities win — A agrees on 1, B
    // recovers and agrees on 10; the bridge does NOT merge them
    // (majority beats the single cross-community vote)
    val l = lpa(twoTri, 3)
    assert(l(1L) === 1L && l(2L) === 1L && l(3L) === 1L)
    assert(l(10L) === 10L && l(11L) === 10L && l(12L) === 10L)
  }

  test("0 rounds = identity labels") {
    val l = lpa(twoTri, 0)
    assert(l === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 10L -> 10L,
      11L -> 11L, 12L -> 12L))
  }

  test("ties break to the smallest label (deterministic)") {
    // star: center 5 with leaves 6,7 — round 1: center sees
    // {5,6,7} each once → takes 5; leaves see {5,6}/{5,7} → take 5
    val star = Seq((5L, 6L), (5L, 7L)).toDF("a", "b")
    val l = lpa(star, 1)
    assert(l === Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("self-vote damps the 2-cycle oscillation") {
    // bare edge 1-2: WITHOUT self-votes synchronous LPA swaps labels
    // forever; with the self-vote both see a tie and adopt 1
    val l = lpa(Seq((1L, 2L)).toDF("a", "b"), 4)
    assert(l === Map(1L -> 1L, 2L -> 1L))
  }
}
