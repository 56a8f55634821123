package graft

import org.apache.spark.sql.functions._

import graft.operators.Evals

/** Unit semantics for [[Evals]]: Bradley-Terry MM rounds against an
  * independent plain-Scala replay of the integer chain, exact AUC
  * against brute-force all-pairs counting (tie credit included),
  * calibration bins/ECE hand-computed, and Cohen's kappa closed-form
  * cases (perfect, worse-than-chance sign handling, margins).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- BT

  /** Plain-Scala replay of the [[Evals.bradleyTerry]] integer chain:
    * same micro units, same 1e15 scaling, same truncating integral
    * divides, same Σ=|I|·1e6 renormalization. */
  private def btReference(
      oriented: Seq[(Long, Long, Long, Long)], // (item, opp, n, w)
      iters: Int): Map[Long, Long] = {
    val items = oriented.map(_._1).distinct.sorted
    val wins = oriented.groupBy(_._1).view
      .mapValues(_.map(_._4).sum).toMap
    var s: Map[Long, BigInt] =
      items.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to iters) {
      val denom = oriented.groupBy(_._1).view.mapValues { rows =>
        rows.map { case (i, j, n, _) =>
          (BigInt(n) * BigInt("1000000000000000")) / (s(i) + s(j))
        }.sum
      }.toMap
      val raw = items.map { i =>
        i -> (BigInt(wins(i)) * BigInt("1000000000000000")) / denom(i)
      }.toMap
      val tot = raw.values.sum
      s = items.map { i =>
        i -> raw(i) * items.size * 1000000 / tot
      }.toMap
    }
    s.map { case (k, v) => k -> v.toLong }
  }

  private def bt(oriented: Seq[(Long, Long, Long, Long)], iters: Int) =
    Evals.bradleyTerry(
        oriented.toDF("item", "opp", "n", "w"), iters)
      .select("item", "strength_micro").as[(Long, Long)]
      .collect().toMap

  /** Symmetric-orientation helper: one undirected (i, j, n, wi) pair
    * expands to both oriented rows. */
  private def pairs(p: (Long, Long, Long, Long)*) =
    p.flatMap { case (i, j, n, wi) =>
      Seq((i, j, n, wi), (j, i, n, n - wi)) }

  test("bradleyTerry matches the plain-Scala integer replay on a " +
      "3-item cycle, every round count") {
    // non-transitive-ish cycle with unequal counts
    val o = pairs((0L, 1L, 10L, 7L), (1L, 2L, 8L, 5L),
      (0L, 2L, 12L, 4L))
    for (iters <- 1 to 4)
      assert(bt(o, iters) === btReference(o, iters),
        s"diverged at iters=$iters")
  }

  test("bradleyTerry recovers the planted order and renormalizes " +
      "to ~|I|*1e6") {
    // 9/10 wins for the stronger item in every pairing of 1 < 2 < 3
    val o = pairs((1L, 2L, 10L, 1L), (2L, 3L, 10L, 1L),
      (1L, 3L, 10L, 0L))
    val s = bt(o, iters = 3)
    assert(s(1L) < s(2L) && s(2L) < s(3L))
    val total = s.values.sum
    // truncating divides only ever lose micros
    assert(total <= 3000000L && total > 3000000L - 10L)
  }

  test("bradleyTerry: a zero-win item converges to strength 0") {
    val o = pairs((0L, 1L, 5L, 0L), (0L, 2L, 5L, 0L),
      (1L, 2L, 6L, 3L))
    val s = bt(o, iters = 3)
    assert(s(0L) === 0L)
    assert(s(1L) > 0L && s(2L) > 0L)
  }

  test("bradleyTerry rejects a single-item domain") {
    intercept[IllegalArgumentException] {
      bt(Seq((0L, 0L, 1L, 1L)), iters = 1)
    }
  }

  test("orientedPairs merges both raw orientations of a pair") {
    val cmp = Seq((1L, 2L, true), (1L, 2L, false), (2L, 1L, true),
        (2L, 1L, true), (2L, 1L, false))
      .toDF("a", "b", "wa")
    val o = Evals.orientedPairs(cmp, "a", "b", "wa")
      .as[(Long, Long, Long, Long)].collect().toSet
    // item 1: wins = 1 (as a) + 1 (as loser-side of b wins... ) —
    // raw: (1,2,T) 1 win; (1,2,F) 0; (2,1,T)x2 two wins for 2;
    // (2,1,F) one win for 1  → item1: n=5 w=2; item2: n=5 w=3
    assert(o === Set((1L, 2L, 5L, 2L), (2L, 1L, 5L, 3L)))
  }

  test("orientedPairs excludes NULL-winner rows from both n and w") {
    // A NULL winner must carry no evidence: if it counted in n with
    // w=0, the reversed orientation's n−w would fabricate a WIN for
    // the b side out of missing data.
    val cmp = Seq((1L, 2L, Some(true)), (1L, 2L, None),
        (1L, 2L, None), (2L, 1L, Some(false)))
      .toDF("a", "b", "wa")
    val o = Evals.orientedPairs(cmp, "a", "b", "wa")
      .as[(Long, Long, Long, Long)].collect().toSet
    // Only the two decided rows survive: item1 n=2 w=2, item2 n=2 w=0.
    assert(o === Set((1L, 2L, 2L, 2L), (2L, 1L, 2L, 0L)))
  }

  // --------------------------------------------------------- AUC

  private def aucRow(scored: Seq[(Long, Boolean)])
      : (Long, Long, Long, Long) =
    Evals.exactAuc(scored.toDF("c", "y"), col("c"), col("y"))
      .as[(Long, Long, Long, Long)].collect().head

  /** Brute-force 2U = 2·#(pos>neg) + #(pos==neg). */
  private def bruteTwoU(scored: Seq[(Long, Boolean)]): Long = {
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    pos.map(p => 2L * neg.count(p > _) + neg.count(p == _)).sum
  }

  test("exactAuc matches brute-force all-pairs counting with ties") {
    val scored = Seq(3L -> true, 1L -> false, 3L -> false,
      2L -> true, 2L -> false, 5L -> true, 1L -> true, 1L -> false,
      4L -> false, 5L -> true)
    val (p, q, twoU, ppm) = aucRow(scored)
    assert((p, q) === (5L, 5L))
    assert(twoU === bruteTwoU(scored))
    assert(ppm === twoU * 500000L / (p * q))
  }

  test("exactAuc endpoints: separation=1e6, reversal=0, ties=5e5") {
    assert(aucRow(Seq(2L -> true, 3L -> true, 1L -> false))._4
      === 1000000L)
    assert(aucRow(Seq(1L -> true, 2L -> false, 3L -> false))._4
      === 0L)
    assert(aucRow(Seq(7L -> true, 7L -> false))._4 === 500000L)
  }

  test("exactAucBy computes each slice independently") {
    val scored = Seq(
      ("a", 2L, true), ("a", 3L, true), ("a", 1L, false), // perfect
      ("b", 1L, true), ("b", 2L, false), ("b", 3L, false), // reversed
      ("c", 7L, true), ("c", 7L, false)) // all ties
      .toDF("slice", "c", "y")
    val r = Evals.exactAucBy(scored, col("slice"), col("c"),
        col("y"))
      .select("slice", "auc_ppm").as[(String, Long)]
      .collect().toMap
    assert(r === Map("a" -> 1000000L, "b" -> 0L, "c" -> 500000L))
  }

  // ---------------------------------------------------- isotonic

  /** Plain-Scala sequential PAVA (textbook stack form) in the same
    * exact rational algebra — an INDEPENDENT implementation shape
    * (stack merges, not run-pooling passes). */
  private def pavaReference(bins: Seq[(Long, Long, Long)])
      : List[(Long, Long, Long, Long, Long)] = {
    case class B(lo: Long, hi: Long, n: BigInt, pos: BigInt)
    val stack = scala.collection.mutable.Stack[B]()
    for ((b, n, p) <- bins.sortBy(_._1)) {
      var cur = B(b, b, n, p)
      while (stack.nonEmpty &&
          stack.top.pos * cur.n > cur.pos * stack.top.n) {
        val t = stack.pop()
        cur = B(t.lo, cur.hi, t.n + cur.n, t.pos + cur.pos)
      }
      stack.push(cur)
    }
    stack.toList.reverse.map(b => (b.lo, b.hi, b.n.toLong,
      b.pos.toLong, (b.pos * 1000000 / b.n).toLong))
  }

  private def iso(bins: Seq[(Long, Long, Long)]) =
    Evals.isotonicFit(bins.toDF("bin", "n", "pos"),
        passes = bins.size)
      .as[(Long, Long, Long, Long, Long)].collect().toList

  test("isotonicFit matches the sequential stack PAVA on a " +
      "violating sequence (cascade pooling included)") {
    // rates 0.9, 0.1, 0.5: pooling (0.9,0.1) -> 0.5 then the new
    // block ties 0.5 — cross-mult equality must NOT pool (strict >)
    val a = Seq((0L, 10L, 9L), (1L, 10L, 1L), (2L, 10L, 5L))
    assert(iso(a) === pavaReference(a))
    // cascade: 0.8, 0.6, 0.1 all pool into one block
    val b = Seq((0L, 10L, 8L), (1L, 10L, 6L), (2L, 10L, 1L))
    assert(iso(b) === pavaReference(b))
    assert(iso(b).size === 1)
    // triangle: rise then fall — the falling half pools
    val c = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L),
      (3L, 10L, 6L), (4L, 10L, 2L))
    assert(iso(c) === pavaReference(c))
  }

  test("isotonicFit: already-monotone input is untouched and " +
      "weighted pooling uses exact rational means") {
    val mono = Seq((0L, 5L, 1L), (1L, 7L, 3L), (2L, 2L, 2L))
    assert(iso(mono) === pavaReference(mono))
    assert(iso(mono).size === 3)
    // unequal weights: (n=1, 1.0) then (n=9, 0.0) pools to 1/10
    val w = Seq((0L, 1L, 1L), (1L, 9L, 0L))
    assert(iso(w) === List((0L, 1L, 10L, 1L, 100000L)))
  }

  test("isotonicFit output is always non-decreasing (md5-derived " +
      "ragged input)") {
    val ragged = (0L until 12L).map { b =>
      val h = math.abs((b * 2654435761L) % 97)
      (b, h % 7 + 1, h % (h % 7 + 2))
    }
    val r = iso(ragged)
    assert(r === pavaReference(ragged))
    val rates = r.map(x => BigDecimal(x._4) / BigDecimal(x._3))
    assert(rates === rates.sorted)
  }

  // ---------------------------------------------------- spearman

  /** Plain-Scala Spearman with mid-ranks (independent shape:
    * per-value mid-ranks from sorted groups, double moments). */
  private def spearmanReference(xs: Seq[Long], ys: Seq[Long])
      : Double = {
    def midRank2(v: Seq[Long]): Map[Long, Long] = {
      val grouped = v.groupBy(identity).toSeq.sortBy(_._1)
      var below = 0L
      grouped.map { case (k, g) =>
        val r = 2 * below + g.size + 1L
        below += g.size
        k -> r
      }.toMap
    }
    val (rx, ry) = (midRank2(xs), midRank2(ys))
    val pts = xs.zip(ys).map { case (x, y) =>
      (rx(x).toDouble, ry(y).toDouble) }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val rho = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    math.floor(rho * 1e6 + 0.5) / 1e6
  }

  private def rhoOf(pts: Seq[(Long, Long)]): Double =
    Evals.spearman(pts.toDF("x", "y"), col("x"), col("y"))
      .select("rho").as[Double].collect().head

  test("spearman: monotone=1, reversed=-1, tied data matches the " +
      "mid-rank reference") {
    assert(rhoOf(Seq((1L, 10L), (2L, 20L), (3L, 900L))) === 1.0)
    assert(rhoOf(Seq((1L, 30L), (2L, 20L), (3L, 10L))) === -1.0)
    val tied = Seq((1L, 5L), (1L, 7L), (2L, 5L), (3L, 9L), (3L, 2L),
      (4L, 9L), (5L, 1L))
    assert(rhoOf(tied) ===
      spearmanReference(tied.map(_._1), tied.map(_._2)))
  }

  test("spearman is invariant under monotone rescaling of either " +
      "score") {
    val pts = Seq((3L, 9L), (1L, 2L), (4L, 11L), (1L, 5L), (5L, 3L),
      (9L, 40L), (2L, 6L))
    val squished = pts.map { case (x, y) => (x * x, y / 2) }
    // x -> x^2 monotone on non-negatives; y -> y/2 keeps order
    // except merging 2,3 -> 1: recompute reference instead
    assert(rhoOf(squished) ===
      spearmanReference(squished.map(_._1), squished.map(_._2)))
    assert(rhoOf(pts.map { case (x, y) => (x * x, y * 10) }) ===
      rhoOf(pts))
  }

  // ------------------------------------------------------ fleiss

  test("fleissKappa: unanimity is 1e6; hand-computed mixed case") {
    val unanimous = Seq(("a", "a", "a"), ("b", "b", "b"))
      .toDF("l0", "l1", "l2")
    val k1 = Evals.fleissKappa(unanimous,
        Seq(col("l0"), col("l1"), col("l2")))
      .select("kappa_ppm").as[Long].collect().head
    assert(k1 === 1000000L)
    // n=2, k=3: item1 (a,a,b) e=1, item2 (b,b,b) e=3 -> E=4
    // marginals a=2, b=4 -> B=4+16=20, nk=6
    // num = 2*4*36 - 20*6*2 = 288-240 = 48
    // den = 6*2*(36-20) = 192 -> kappa = 0.25
    val mixed = Seq(("a", "a", "b"), ("b", "b", "b"))
      .toDF("l0", "l1", "l2")
    val r = Evals.fleissKappa(mixed,
        Seq(col("l0"), col("l1"), col("l2")))
      .as[(String, Long, Long)].collect().toList
    assert(r === List(("a", 2L, 250000L), ("b", 4L, 250000L)))
  }

  test("fleissKappa goes negative on systematic disagreement and " +
      "accepts k=2 (Cohen-comparable)") {
    // k=2, always disagree, balanced marginals: kappa = -1
    val opp = Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x"))
      .toDF("l0", "l1")
    val k = Evals.fleissKappa(opp, Seq(col("l0"), col("l1")))
      .select("kappa_ppm").as[Long].collect().head
    assert(k === -1000000L)
  }

  // --------------------------------------------- operating points

  test("operatingPoints: hand-computed confusion sweep with exact " +
      "rational F1") {
    // pos scores: 5, 9; neg scores: 1, 5
    val scored = Seq((5L, true), (9L, true), (1L, false), (5L, false))
      .toDF("c", "y")
    val r = Evals.operatingPoints(scored, col("c"), col("y"),
        Seq(2L, 6L))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toList
    // t=2: tp=2 fp=1 fn=0 tn=1 -> P=2/3, R=1, F1=4/5
    // t=6: tp=1 fp=0 fn=1 tn=2 -> P=1, R=1/2, F1=2/3
    assert(r === List(
      (2L, 2L, 1L, 0L, 1L, 666666L, 1000000L, 800000L),
      (6L, 1L, 0L, 1L, 2L, 1000000L, 500000L, 666666L)))
  }

  // --------------------------------------------------- bootstrap

  test("bootstrapAucReplicates: unit weights reproduce exactAuc " +
      "exactly; doubling all weights leaves auc_ppm unchanged") {
    val scored = Seq((3L, true), (1L, false), (3L, false),
      (2L, true), (5L, true), (1L, true), (4L, false))
      .toDF("c", "y")
    val point = Evals.exactAuc(scored, col("c"), col("y"))
      .select("two_u", "auc_ppm").as[(Long, Long)].collect().head
    val reps = Evals.bootstrapAucReplicates(scored, col("c"),
        col("y"), Seq(lit(1L), lit(2L)))
      .select("replicate", "two_u", "auc_ppm")
      .as[(Long, Long, Long)].collect().toList
    assert(reps.head === ((0L, point._1, point._2)))
    // w=2 scales 2U by 4 and P·Q by 4 — auc identical
    assert(reps(1)._3 === point._2)
    assert(reps(1)._2 === 4L * point._1)
  }

  test("bootstrapAucReplicates: a replicate that weighs out one " +
      "class entirely is dropped") {
    val scored = Seq((3L, true), (1L, false)).toDF("c", "y")
    val reps = Evals.bootstrapAucReplicates(scored, col("c"),
        col("y"),
        Seq(lit(1L), when(col("y"), 0L).otherwise(1L)))
      .select("replicate").as[Long].collect().toList
    assert(reps === List(0L))
  }

  // ------------------------------------------------- calibration

  test("calibrationBins: hand-computed bins, gaps, and ECE") {
    // bin 1: conf 100000, miss → gap |100000 − 0| = 100000
    // bin 3: conf 300000, hit  → gap |300000 − 1e6| = 700000
    // bin 9: conf 900000+950000, 2 hits → gap |1850000−2e6| = 150000
    // ece = (100000 + 700000 + 150000) div 4 = 237500
    val preds = Seq((100000L, false), (300000L, true),
      (900000L, true), (950000L, true)).toDF("conf", "y")
    val r = Evals.calibrationBins(preds, col("conf"), col("y"), 10)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    assert(r === List(
      (1L, 1L, 100000L, 0L, 100000L, 237500L),
      (3L, 1L, 300000L, 1L, 700000L, 237500L),
      (9L, 2L, 1850000L, 2L, 150000L, 237500L)))
  }

  test("calibrationBins: boundary confidences land in end bins") {
    val preds = Seq((0L, false), (999999L, true)).toDF("conf", "y")
    val bins = Evals.calibrationBins(preds, col("conf"), col("y"), 10)
      .select("bin").as[Long].collect().toSet
    assert(bins === Set(0L, 9L))
  }

  // ----------------------------------------------------- kendall

  /** Brute-force all-pairs Kendall counts. */
  private def kendallBrute(pts: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Long) = {
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L; var txy = 0L
    for (i <- pts.indices; j <- pts.indices if i < j) {
      val ((x1, y1), (x2, y2)) = (pts(i), pts(j))
      if (x1 == x2 && y1 == y2) txy += 1
      else if (x1 == x2) tx += 1
      else if (y1 == y2) ty += 1
      else if ((x1 < x2) == (y1 < y2)) c += 1
      else d += 1
    }
    (c, d, tx, ty, txy)
  }

  test("kendallGrid matches brute-force pair counting and the " +
      "C+D+ties identity, ties in every position") {
    val pts = Seq((1L, 1L), (1L, 1L), (1L, 3L), (2L, 2L), (2L, 5L),
      (3L, 2L), (3L, 9L), (4L, 9L), (5L, 4L), (5L, 4L), (6L, 0L))
    val (c, d, tx, ty, txy) = kendallBrute(pts)
    val r = Evals.kendallGrid(pts.toDF("x", "y"), col("x"),
        col("y"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect().head
    assert((r._2, r._3, r._4, r._5, r._6) === ((c, d, tx, ty, txy)))
    val n = pts.size.toLong
    assert(c + d + tx + ty + txy === n * (n - 1) / 2)
    assert(r._7 === (c - d) * 2000000L / (n * (n - 1)))
    val n0 = n * (n - 1) / 2d
    val tauB = (c - d) / math.sqrt(
      (n0 - (tx + txy)) * (n0 - (ty + txy)))
    assert(r._8 === math.floor(tauB * 1e6 + 0.5) / 1e6)
  }

  test("kendallGrid endpoints: perfect agreement 1e6, perfect " +
      "reversal -1e6 on distinct scores") {
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
    val r1 = Evals.kendallGrid(up.toDF("x", "y"), col("x"),
        col("y")).select("tau_a_ppm", "tau_b")
      .as[(Long, Double)].collect().head
    assert(r1 === ((1000000L, 1.0)))
    val down = up.map { case (x, y) => (x, -y) }
    val r2 = Evals.kendallGrid(down.toDF("x", "y"), col("x"),
        col("y")).select("tau_a_ppm", "tau_b")
      .as[(Long, Double)].collect().head
    assert(r2 === ((-1000000L, -1.0)))
  }

  // --------------------------------------------- target encoding

  test("targetEncodeLoo: hand-computed LOO and smoothed encodings, " +
      "single-row category yields null LOO") {
    // cat a: ys 10, 20 (sum 30); cat b: y 40. total 70, N 3, m 2
    // global mean = 70/3
    val rows = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 40L))
      .toDF("id", "cat", "y")
    val r = Evals.targetEncodeLoo(rows, col("id"), col("cat"),
        col("y"), m = 2)
      .orderBy("id")
      .select("id", "loo_micro", "smoothed_micro")
      .as[(Long, Option[Long], Long)].collect().toList
    // id1: loo = 20/1; smoothed = (20*3 + 2*70)/(1+2)/3 = 200/9
    // id2: loo = 10;    smoothed = (10*3 + 140)/9 = 170/9
    // id3: loo null;    smoothed = (0*3 + 140)/(0+2)/3 = 140/6
    assert(r === List(
      (1L, Some(20000000L), 200000000L / 9L),
      (2L, Some(10000000L), 170000000L / 9L),
      (3L, None, 140000000L / 6L)))
  }

  test("targetEncodeLoo: encoding never leaks the row's own label " +
      "(constant-target category is flat regardless of own y)") {
    val rows = Seq((1L, "a", 7L), (2L, "a", 7L), (3L, "a", 7L))
      .toDF("id", "cat", "y")
    val loo = Evals.targetEncodeLoo(rows, col("id"), col("cat"),
        col("y"), m = 0)
      .select("loo_micro").as[Long].collect().toSet
    assert(loo === Set(7000000L))
  }

  // ----------------------------------------------- vocab coverage

  test("vocabCoverage: hand-computed f1/f2, Good-Turing mass and " +
      "bias-corrected Chao1") {
    import graft.operators.Corpus
    // unigrams: a x3, b x2, c x1, d x1 -> N=7 D=4 f1=2 f2=1
    val docs = Seq("a a b", "a b c d").toDF("text")
    val r = Corpus.vocabCoverage(docs, "text", n = 1)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    // gt = 2e6 div 7 = 285714; chao1_extra = 2*1 div (2*2) = 0
    assert(r === ((7L, 4L, 2L, 1L, 285714L, 0L, 4L)))
    // all singletons, f2=0: corrected Chao1 stays defined
    val s = Seq("x y z").toDF("text")
    val r2 = Corpus.vocabCoverage(s, "text", n = 1)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    // f1=3, f2=0: extra = 3*2 div 2 = 3, chao1 = 6, gt = 1e6
    assert(r2 === ((3L, 3L, 3L, 0L, 1000000L, 3L, 6L)))
  }

  // ------------------------------------------------------- kappa

  private def kappaOf(rows: Seq[(String, String)]): Long =
    Evals.cohenKappa(rows.toDF("a1", "a2"), col("a1"), col("a2"))
      .select("kappa_ppm").as[Long].collect().head

  test("cohenKappa: perfect agreement on >=2 classes is exactly 1e6") {
    assert(kappaOf(Seq("x" -> "x", "y" -> "y", "x" -> "x"))
      === 1000000L)
  }

  test("cohenKappa: systematic disagreement goes negative with " +
      "explicit sign handling") {
    // always-opposite labels: po=0, pe=1/2 → kappa = -1
    val k = kappaOf(Seq("x" -> "y", "y" -> "x", "x" -> "y",
      "y" -> "x"))
    assert(k === -1000000L)
  }

  test("cohenKappa: hand-computed mixed case with margins") {
    // N=4, agree=3; margins a1: x=3,y=1; a2: x=2,y=2 → rc=3·2+1·2=8
    // kappa = (3·4−8)/(16−8) = 1/2
    val rows = Seq("x" -> "x", "x" -> "x", "x" -> "y", "y" -> "y")
    val df = Evals.cohenKappa(rows.toDF("a1", "a2"), col("a1"),
        col("a2")).orderBy("label")
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(df === List(("x", 3L, 2L, 2L, 500000L),
      ("y", 1L, 2L, 1L, 500000L)))
  }

  test("cohenKappa: a class seen by only one annotator keeps full " +
      "margins via the outer join") {
    // a2 never says "z"; a1 never says "w"
    val rows = Seq("z" -> "x", "x" -> "w", "x" -> "x")
    val m = Evals.cohenKappa(rows.toDF("a1", "a2"), col("a1"),
        col("a2")).orderBy("label")
      .select("label", "row_n", "col_n", "diag_n")
      .as[(String, Long, Long, Long)].collect().toList
    assert(m === List(("w", 0L, 1L, 0L), ("x", 2L, 2L, 1L),
      ("z", 1L, 0L, 0L)))
  }
}
