package graft

import org.apache.spark.sql.functions._
import graft.operators.{Components, AsOfJoin}

/** Unit tests for connected-components label propagation: transitive
  * chains, isolated vertices, multiple components, convergence, and
  * the as-of tiebreak determinism added alongside it.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("a", "b")
    Components.connectedComponents(n, "id", e, "a", "b")
      .as[(Long, Long)].collect().toMap
  }

  private def ccStar(nodes: Seq[Long], edges: Seq[(Long, Long)],
      maxIters: Int = 20): Map[Long, Long] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("a", "b")
    Components.connectedComponentsStar(n, "id", e, "a", "b", maxIters)
      .as[(Long, Long)].collect().toMap
  }

  test("chain A-B-C clusters transitively even without an A-C edge") {
    val got = cc(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("isolated vertices are singleton components") {
    val got = cc(Seq(1L, 2L, 3L, 9L), Seq((1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 9L -> 9L))
  }

  test("two components stay separate; label = min id per component") {
    val got = cc(Seq(1L, 2L, 3L, 4L, 5L, 6L),
      Seq((5L, 2L), (2L, 1L), (4L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 1L,
      4L -> 4L, 6L -> 4L, 3L -> 3L))
  }

  test("long path converges within the diameter bound") {
    // path 10-9-8-...-1: min label must walk 9 hops
    val nodes = (1L to 10L)
    val edges = (1L until 10L).map(i => (i, i + 1))
    val got = cc(nodes, edges)
    assert(got.values.toSet == Set(1L))
  }

  test("edge direction and duplicates don't matter") {
    val got = cc(Seq(1L, 2L, 3L),
      Seq((2L, 1L), (1L, 2L), (3L, 2L), (3L, 2L)))
    assert(got.values.toSet == Set(1L))
  }

  test("star kernel equals min-label kernel on every fixture above") {
    val fixtures: Seq[(Seq[Long], Seq[(Long, Long)])] = Seq(
      (Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L))),
      (Seq(1L, 2L, 3L, 9L), Seq((1L, 2L))),
      (Seq(1L, 2L, 3L, 4L, 5L, 6L), Seq((5L, 2L), (2L, 1L), (4L, 6L))),
      ((1L to 10L), (1L until 10L).map(i => (i, i + 1))),
      (Seq(1L, 2L, 3L), Seq((2L, 1L), (1L, 2L), (3L, 2L), (3L, 2L))),
      (Seq(7L), Seq.empty))
    fixtures.zipWithIndex.foreach { case ((n, e), i) =>
      assert(ccStar(n, e) == cc(n, e), s"fixture $i diverged")
    }
  }

  test("star kernel: hub graph — high-id hub, many low-id leaves") {
    // Star centered on id 1000 (the hub is NOT the min): every leaf
    // reaches every other only through the hub; component min is a
    // leaf. This is the boilerplate-shingle shape that makes the
    // min-label kernel re-ship the hot label through every round.
    val leaves = (1L to 50L)
    val edges = leaves.map(l => (1000L, l))
    val got = ccStar(leaves :+ 1000L, edges)
    assert(got.values.toSet == Set(1L), s"got ${got.values.toSet}")
    assert(got.size == 51)
  }

  test("star kernel: deep path converges where min-label's round " +
      "budget would not") {
    // Path of 64 nodes, diameter 63: min-label needs 63 rounds (its
    // default bound of 20 throws); large-star/small-star halves
    // depth per round and finishes inside the SAME bound of 20.
    val nodes = (1L to 64L)
    val edges = (1L until 64L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      cc(nodes, edges) // default maxIters = 20 < diameter
    }
    val got = ccStar(nodes, edges, maxIters = 20)
    assert(got.values.toSet == Set(1L))
    assert(got.size == 64)
  }

  test("star kernel: descending-id chain and duplicate reversed edges") {
    // ids descend along the chain so the min sits at the FAR end of
    // every propagation direction; duplicates/reversals must collapse
    val got = ccStar(Seq(5L, 4L, 3L, 2L, 1L),
      Seq((5L, 4L), (4L, 5L), (4L, 3L), (3L, 2L), (2L, 1L), (2L, 1L)))
    assert(got.values.toSet == Set(1L))
  }

  test("curate accepts the star kernel and answers identically") {
    val base = ('a' to 't').map(c => s"tok$c").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base + " xa"), (3L, base + " xa xb"),
      (50L, ('a' to 'z').map(c => s"other$c$c").mkString(" "))
    ).toDF("doc_id", "text")
    val viaStar = operators.Curate.curate(docs, "doc_id", "text",
        minQuality = 0.0, minJaccard = 0.93,
        policy = operators.Curate.NearDupPolicy.TransitiveMinId,
        ccKernel = operators.Components.Kernel.Star)
      .select($"id").as[Long].collect().toSet
    assert(viaStar == Set(1L, 50L), s"star-kernel survivors: $viaStar")
  }

  test("curate transitive policy keeps one doc per near-dup cluster") {
    // 20-token base doc: chain copies at +1/+2 tokens, J(A,B)=18/19,
    // J(B,C)=19/20 >= 0.93 but J(A,C)=18/20 < 0.93 — a true chain.
    // letters only: Curate.normalize strips digits, which would
    // collapse tok1/tok2/... into identical tokens
    val base = ('a' to 't').map(c => s"tok$c").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base + " xa"), (3L, base + " xa xb"),
      (50L, ('a' to 'z').map(c => s"other$c$c").mkString(" "))
    ).toDF("doc_id", "text")
    val greedy = operators.Curate.curate(docs, "doc_id", "text",
        minQuality = 0.0, minJaccard = 0.93)
      .select($"id").as[Long].collect().toSet
    val trans = operators.Curate.curate(docs, "doc_id", "text",
        minQuality = 0.0, minJaccard = 0.93,
        policy = operators.Curate.NearDupPolicy.TransitiveMinId)
      .select($"id").as[Long].collect().toSet
    // both policies collapse the chain to doc 1 here (2 and 3 each
    // appear as the later member of some pair), and keep 50
    assert(trans == Set(1L, 50L))
    assert(greedy == Set(1L, 50L))
    // best-quality policy keeps the highest-quality chain member
    // instead of the min id: doc 3 has two extra unique tokens, so
    // its quality strictly exceeds docs 1 and 2
    val best = operators.Curate.curate(docs, "doc_id", "text",
        minQuality = 0.0, minJaccard = 0.93,
        policy = operators.Curate.NearDupPolicy.TransitiveBestQuality)
      .select($"id").as[Long].collect().toSet
    assert(best == Set(3L, 50L), s"best-quality survivors: $best")
  }

  test("asof tiebreak: duplicate right (key, ts) rows attach the greatest tiebreak payload") {
    val left = Seq((1L, 100L, "p")).toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 100L, 8L))
      .toDF("k", "ts", "sid")
    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("sid"),
        tiebreak = Seq("sid"))
      .select($"sid").as[Long].collect()
    assert(out.toSeq == Seq(9L))
  }

  test("asof forward direction picks the earliest right row at-or-after") {
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b"), (1L, 400L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "r100"), (1L, 300L, "r300"))
      .toDF("k", "ts", "payload")
    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("payload"),
        direction = "forward")
      .select($"tag", $"payload").as[(String, String)].collect().toMap
    assert(out("a") == "r100") // inclusive at equal ts
    assert(out("b") == "r300")
    assert(out("c") == null)   // nothing after 400
  }

  test("asof tolerance nulls matches farther than the allowed gap") {
    val left = Seq((1L, 100L, "near"), (1L, 900L, "far"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 80L, "r80")).toDF("k", "ts", "payload")
    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("payload"),
        tolerance = Some((l, r) => l - r <= lit(50L)))
      .select($"tag", $"payload").as[(String, String)].collect().toMap
    assert(out("near") == "r80")  // gap 20 <= 50
    assert(out("far") == null)    // gap 820 > 50: match suppressed
  }

  test("degree-ordered triangle plan (q103) answers exactly like " +
      "the id-ordered plan (q100)") {
    val d = sf("sf0.001")
    val idOrdered = queries.ComponentsQ.q100.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val degOrdered = queries.ComponentsQ.q103.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(idOrdered.nonEmpty && idOrdered(0)._3 > 0)
    assert(degOrdered.sameElements(idOrdered))
  }

  test("curate policies all survive an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    import operators.Curate, Curate.NearDupPolicy._
    Seq(Greedy, TransitiveMinId, TransitiveBestQuality).foreach { p =>
      assert(Curate.curate(empty, "doc_id", "text", policy = p)
        .count() == 0L, s"policy $p")
    }
  }
}
