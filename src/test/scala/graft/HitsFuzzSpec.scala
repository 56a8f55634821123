package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Randomized-graph property suite for [[PageRank.integerHits]]
  * (q204): the Spark chain vs an independent BigInt reference of the
  * exact integer recurrence, over a seeded grid sweeping zipf-style
  * hub skew, vertex-domain size, duplicate-edge density, and
  * iteration count — a far denser net than whole-dataset seed
  * regens, and exact at any magnitude because the reference never
  * leaves BigInt.
  *
  * Also pins the [[PageRank.hitsStageDigest]] instrumentation to the
  * reference's per-stage stats, so the digest rows q204 hashes are
  * themselves correct by construction — when a driver run ever reads
  * red again, the first diverging digest row can be trusted to name
  * the true first diverging half-round.
  */
class HitsFuzzSpec extends SparkSpec {
  import spark.implicits._

  /** Exact-integer reference in BigInt end-to-end: raw per-stage sums
    * and the (v·1e6) div max rescale, with every intermediate kept so
    * digests can be checked stage-by-stage. Stage order mirrors
    * [[PageRank.integerHitsTrace]]: a1r a1 h1r h1 … */
  private def refTrace(edges: Seq[(Long, Long)], iters: Int)
      : Seq[(String, Map[Long, BigInt])] = {
    val e = edges.distinct
    var h: Map[Long, BigInt] =
      e.map(_._1).distinct.map(_ -> BigInt(1000000)).toMap
    var a = Map.empty[Long, BigInt]
    val out = Seq.newBuilder[(String, Map[Long, BigInt])]
    for (i <- 1 to iters) {
      val ar = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(x => h(x._1)).sum }
      out += (s"a${i}r" -> ar)
      val amx = ar.values.max
      a = ar.map { case (k, v) => k -> v * 1000000 / amx }
      out += (s"a$i" -> a)
      val hr = e.groupBy(_._1).map { case (s, es) =>
        s -> es.map(x => a(x._2)).sum }
      out += (s"h${i}r" -> hr)
      val hmx = hr.values.max
      h = hr.map { case (k, v) => k -> v * 1000000 / hmx }
      out += (s"h$i" -> h)
    }
    out.result()
  }

  /** Zipf-ish random digraph: src drawn ∝ rank^(-alpha) over nSrc,
    * dst likewise over nDst (shifted domain so the graph is
    * non-bipartite when domains overlap), plus duplicate edges at
    * `dupPct` percent. */
  private def randGraph(seed: Long, nSrc: Int, nDst: Int,
      alpha: Double, nEdges: Int, dupPct: Int,
      dstShift: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    def zipf(n: Int): Int = {
      // inverse-CDF sample of rank^(-alpha) by linear scan over the
      // (small) domain — exactness doesn't matter, skew does
      val ws = (1 to n).map(r => math.pow(r, -alpha))
      val tot = ws.sum
      var u = rnd.nextDouble() * tot
      var i = 0
      while (i < n - 1 && u > ws(i)) { u -= ws(i); i += 1 }
      i
    }
    val base = (1 to nEdges).map { _ =>
      (zipf(nSrc).toLong, dstShift + zipf(nDst).toLong)
    }
    val dups = base.filter(_ => rnd.nextInt(100) < dupPct)
    rnd.shuffle(base ++ dups)
  }

  private def sparkTrace(edges: Seq[(Long, Long)], iters: Int)
      : Seq[(String, Map[Long, BigInt])] = {
    val (_, _, tr) = PageRank.integerHitsTrace(
      edges.toDF("s", "t"), "s", "t", iters,
      broadcastScores = Some(true))
    tr.map { case (st, f) =>
      st -> f.select(col("id"),
          col("v").cast("decimal(38,0)").cast("string"))
        .as[(Long, String)].collect()
        .map { case (k, v) => k -> BigInt(v) }.toMap
    }
  }

  test("integerHits == BigInt reference over a seeded grid of " +
      "skewed random graphs (every half-round, every vertex)") {
    var n = 0
    for {
      alpha <- Seq(0.0, 1.0, 2.5)
      (nSrc, nDst) <- Seq((5, 40), (40, 5), (25, 25))
      dupPct <- Seq(0, 40)
      dstShift <- Seq(1000L, 0L) // bipartite and overlapping domains
      seed <- 42L to 44L
    } {
      val e = randGraph(seed + n, nSrc, nDst, alpha,
        nEdges = 30 + (seed % 3).toInt * 170, dupPct = dupPct,
        dstShift = dstShift)
      val want = refTrace(e, iters = 2)
      val got = sparkTrace(e, iters = 2)
      assert(got.map(_._1) == want.map(_._1))
      for (((st, g), (_, w)) <- got.zip(want))
        assert(g == w, s"stage $st diverges: alpha=$alpha " +
          s"nSrc=$nSrc nDst=$nDst dup=$dupPct shift=$dstShift " +
          s"seed=$seed")
      n += 1
    }
    assert(n == 108)
  }

  test("hitsStageDigest rows equal the reference's per-stage " +
      "count / sum / max / min / sum-of-ids") {
    val e = randGraph(7L, 12, 30, 1.5, nEdges = 150, dupPct = 20,
      dstShift = 500L)
    val (_, _, tr) = PageRank.integerHitsTrace(
      e.toDF("s", "t"), "s", "t", iters = 2,
      broadcastScores = Some(true))
    val ref = refTrace(e, iters = 2).toMap
    for ((st, f) <- tr) {
      val got = PageRank.hitsStageDigest(st, f)
        .as[(String, Long, Long)].collect()
        .map { case (_, i, s) => i -> s }.toMap
      val m = ref(st)
      assert(got == Map(
        0L -> m.size.toLong,
        1L -> m.values.sum.toLong,
        2L -> m.values.max.toLong,
        3L -> m.values.min.toLong,
        4L -> m.keys.map(BigInt(_)).sum.toLong), s"stage $st")
    }
  }

  test("NULL edge endpoints are excluded as vertices on both " +
      "sides of the contract (not counted as a key group)") {
    val df = Seq((Some(1L), Some(10L)), (Some(2L), Some(10L)),
        (None: Option[Long], Some(10L)), (Some(1L), None),
        (Some(2L), Some(11L)))
      .toDF("s", "t")
    val (h, a, _) = PageRank.integerHitsTrace(df, "s", "t", 2,
      broadcastScores = Some(true))
    val want = refTrace(Seq((1L, 10L), (2L, 10L), (2L, 11L)), 2)
    val hw = want.last._2
    val aw = want(want.length - 3)._2
    assert(h.as[(Long, Long)].collect().toMap ==
      hw.map { case (k, v) => k -> v.toLong })
    assert(a.as[(Long, Long)].collect().toMap ==
      aw.map { case (k, v) => k -> v.toLong })
  }
}
