package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Drift}

/** Unit semantics for [[Corpus.chunkTokens]] (q192) and
  * [[Drift.histDrift]] (q193): window arithmetic (coverage, the
  * no-trailing-suffix rule, short/empty docs) and the drift algebra
  * (hand-computed smoothed shares, clamping, zero-width baselines,
  * zero drift on identical sides).
  */
class ChunkDriftSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, size: Int, overlap: Int) =
    Corpus.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, overlap)
      .orderBy("chunk_idx")
      .select("chunk_idx", "tok_start", "n_tok", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toList

  test("overlapping windows: starts stride, last window reaches end") {
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val r = chunks(ten, size = 4, overlap = 2)
    // ceil((10-4)/2) = 3 → chunks 0..3 at starts 0,2,4,6
    assert(r.map(c => (c._1, c._2, c._3)) ===
      List((0L, 0L, 4L), (1L, 2L, 4L), (2L, 4L, 4L), (3L, 6L, 4L)))
    assert(r.head._4 === "t1 t2 t3 t4")
    assert(r.last._4 === "t7 t8 t9 t10")
  }

  test("no trailing suffix chunk once a window reaches the end") {
    // ntok=6, size=4, stride=2: window at 2 covers to the end, so no
    // chunk starts at 4 (it would be a suffix of its predecessor)
    val r = chunks("a b c d e f", size = 4, overlap = 2)
    assert(r.map(_._2) === List(0L, 2L))
  }

  test("short doc yields one short chunk; exact fit yields one") {
    assert(chunks("a b c", size = 8, overlap = 2) ===
      List((0L, 0L, 3L, "a b c")))
    assert(chunks("a b c d", size = 4, overlap = 2) ===
      List((0L, 0L, 4L, "a b c d")))
  }

  test("empty and whitespace-only docs yield no chunks") {
    assert(chunks("", 4, 1).isEmpty)
    assert(chunks("   \t  ", 4, 1).isEmpty)
  }

  test("zero overlap tiles disjointly and covers every token") {
    val r = chunks((1 to 9).map("w" + _).mkString(" "), 4, 0)
    assert(r.map(c => (c._2, c._3)) ===
      List((0L, 4L), (4L, 4L), (8L, 1L)))
  }

  test("coverage guarantee: every span of <= overlap+1 tokens is " +
      "inside some chunk; overlap+2 can straddle") {
    // size 8, overlap 3, stride 5 — for every doc length 1..30 and
    // every start a, the span [a, a+4) fits in one chunk (q192's
    // guarantee, L <= overlap+1 = 4)
    for (n <- 1 to 30) {
      val cs = chunksN(n, size = 8, overlap = 3)
      for (a <- 0 to n - 4)
        assert(cs.exists(c => c._1 <= a && a + 4 <= c._1 + c._2),
          s"n=$n span [$a,${a + 4}) uncovered by $cs")
    }
    // counterexample at L = overlap+2 = 5: n=13, span [4,9) straddles
    // chunks [0,8) and [5,13)
    val cs = chunksN(13, size = 8, overlap = 3)
    assert(!cs.exists(c => c._1 <= 4 && 9 <= c._1 + c._2))
  }

  private def chunksN(n: Int, size: Int, overlap: Int) =
    chunks((1 to n).map("w" + _).mkString(" "), size, overlap)
      .map(c => (c._2, c._3))

  test("invalid size/overlap rejected") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Corpus.chunkTokens(df, "doc_id", "text", 0, 0) }
    intercept[IllegalArgumentException] {
      Corpus.chunkTokens(df, "doc_id", "text", 4, 4) }
  }

  // ---- drift ----

  private def drift(base: Seq[Double], cur: Seq[Double], bins: Int) =
    Drift.histDrift(
        (base.map((_, true)) ++ cur.map((_, false)))
          .toDF("v", "is_base"),
        col("v"), col("is_base"), bins)
      .orderBy("bin")
      .select("bin", "n_base", "n_cur", "tv_ppb", "chi_ppb")
      .as[(Long, Long, Long, Long, Long)].collect().toList

  test("hand-computed two-bin drift (integer ppb algebra)") {
    // base 0,1,2,3 → lo=0 hi=3 width=1.5 → bins [2,2]
    // cur 3,3,3,3 → all bin 1 → [0,4]
    // p_ppb = 3·10⁹ div 6 = 500000000 both
    // q_ppb = 10⁹ div 6 = 166666666; 5·10⁹ div 6 = 833333333
    // tv_ppb = |Δ| div 2 = 333333334 div 2, 333333333 div 2
    // chi_ppb = Δ² div p_ppb = 333333334² div 5e8, 333333333² div 5e8
    val r = drift(Seq(0, 1, 2, 3), Seq(3, 3, 3, 3), bins = 2)
    assert(r.map(x => (x._1, x._2, x._3)) ===
      List((0L, 2L, 0L), (1L, 2L, 4L)))
    assert(r.map(_._4) === List(166666667L, 166666666L))
    assert(r.map(_._5) === List(222222223L, 222222221L))
  }

  test("identical sides drift exactly zero in every bin") {
    val xs = Seq(0.0, 1.0, 2.5, 4.0, 4.0, 9.0)
    val r = drift(xs, xs, bins = 4)
    assert(r.forall(x => x._4 === 0L && x._5 === 0L))
    assert(r.size === 4)
  }

  test("candidate mass outside the baseline range clamps to edges") {
    val r = drift(Seq(0, 10), Seq(-50, 99), bins = 5)
    assert(r.head._3 === 1L)   // −50 → bin 0
    assert(r.last._3 === 1L)   // 99 → bin 4
  }

  private def ks(base: Seq[Double], cur: Seq[Double], bins: Int) =
    Drift.ksBins(
        (base.map((_, true)) ++ cur.map((_, false)))
          .toDF("v", "is_base"),
        col("v"), col("is_base"), bins)
      .orderBy("bin")
      .select("bin", "cum_base", "cum_cur", "d_ppb")
      .as[(Long, Long, Long, Long)].collect().toList

  test("hand-computed KS: cumulative share gap peaks at the shift") {
    // base 0,1,2,3 / cur 3,3,3,3, bins=2: cum_base [2,4], cum_cur
    // [0,4] → d_ppb = [2·10⁹ div 4 − 0, 0]; KS = 500000000 ppb
    val r = ks(Seq(0, 1, 2, 3), Seq(3, 3, 3, 3), bins = 2)
    assert(r === List((0L, 2L, 0L, 500000000L), (1L, 4L, 4L, 0L)))
  }

  test("KS is zero everywhere on identical sides") {
    val xs = Seq(0.0, 2.0, 5.0, 9.0)
    assert(ks(xs, xs, bins = 4).forall(_._4 === 0L))
  }

  test("KS catches a location shift that TV on wide bins dilutes") {
    // base uniform on [0,10), cur = base + 1 (same shape, shifted):
    // every cumulative prefix of cur lags by one bin's mass (10⁸ ppb)
    val base = (0 until 10).map(_.toDouble)
    val cur = base.map(_ + 1.0)
    val kss = ks(base, cur, bins = 10).map(_._4).max
    assert(kss >= 90000000L)
  }

  test("constant baseline puts all mass in bin 0, bins still emitted") {
    val r = drift(Seq(5, 5, 5), Seq(5, 7), bins = 3)
    assert(r.map(_._1) === List(0L, 1L, 2L))
    assert(r.head._2 === 3L && r.head._3 === 2L)
    assert(r.tail.forall(x => x._2 === 0L && x._3 === 0L))
  }

  // ---- embeddingCentroidDrift (q230) ----

  private def centroidDrift(rows: Seq[(Long, Int, Array[Float])])
      : Map[Int, (Long, Long, Long)] =
    Drift.embeddingCentroidDrift(
        rows.toDF("vec_id", "label", "emb"), "label", "emb",
        inBaseline = col("vec_id") % 2 === 0)
      .as[(Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("embeddingCentroidDrift: hand-computed squared centroid gap " +
      "in pico units") {
    // label 0: baseline centroid (1, 0) vs candidate (0, 1) —
    // ||d||^2 = 2 -> 2e12 pico. label 1: identical sides -> 0.
    val rows = Seq(
      (0L, 0, Array(1f, 0f)), (2L, 0, Array(1f, 0f)),
      (1L, 0, Array(0f, 1f)), (3L, 0, Array(0f, 1f)),
      (4L, 1, Array(0.5f, 0.5f)), (5L, 1, Array(0.5f, 0.5f)))
    val m = centroidDrift(rows)
    assert(m(0) === ((2L, 2L, 2000000000000L)))
    assert(m(1) === ((1L, 1L, 0L)))
  }

  test("embeddingCentroidDrift: averaging is exact (half-micro gap), " +
      "one-sided labels are dropped") {
    // label 0 baseline: (1, 0) and (0, 0) -> centroid (0.5, 0);
    // candidate (0.5, 0) exactly -> drift 0 despite no single
    // baseline vector equalling the centroid
    val rows = Seq(
      (0L, 0, Array(1f, 0f)), (2L, 0, Array(0f, 0f)),
      (1L, 0, Array(0.5f, 0f)),
      (6L, 9, Array(1f, 1f))) // label 9: baseline only -> dropped
    val m = centroidDrift(rows)
    assert(m(0) === ((2L, 1L, 0L)))
    assert(!m.contains(9))
  }
}
