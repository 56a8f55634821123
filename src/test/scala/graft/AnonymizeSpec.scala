package graft

import org.apache.spark.sql.functions._
import graft.operators.Anonymize

/** Unit semantics for [[Anonymize.generalizationLevels]] (q185):
  * level assignment, the leftovers-only level-2 count (the
  * intersection-attack guard), and the k ≥ published-class invariant.
  */
class AnonymizeSpec extends SparkSpec {
  import spark.implicits._

  // (id, city, region): city is the fine QI, region the coarse one
  private def recs = Seq(
    // 3 in city A (region X) — big enough at k=3
    (1L, "A", "X"), (2L, "A", "X"), (3L, "A", "X"),
    // 2 in city B + 1 in city C (both region X) — each under k,
    // but 3 leftovers together publish at region level
    (4L, "B", "X"), (5L, "B", "X"), (6L, "C", "X"),
    // 2 in city D (region Y) — under k at both levels → suppressed
    (7L, "D", "Y"), (8L, "D", "Y")
  ).toDF("id", "city", "region")

  private def levels(k: Int): Map[Long, Int] =
    Anonymize.generalizationLevels(recs, Seq(col("city")),
        Seq(col("region")), k)
      .select(col("id"), col("anon_level"))
      .as[(Long, Int)].collect().toMap

  test("fine classes >= k publish at level 1") {
    val l = levels(3)
    assert(Seq(1L, 2L, 3L).forall(l(_) == 1))
  }

  test("leftovers pooling to >= k publish at level 2") {
    val l = levels(3)
    assert(Seq(4L, 5L, 6L).forall(l(_) == 2))
  }

  test("classes under k at both levels suppress") {
    val l = levels(3)
    assert(Seq(7L, 8L).forall(l(_) == 9))
  }

  test("level-2 counts EXCLUDE level-1 publishees (intersection guard)") {
    // region Z holds 6 records (city E ×4 published at level 1,
    // city F ×2 leftovers): at k=4 the leftovers are 2 < k and MUST
    // suppress — riding on the full region count (6 ≥ 4) would let an
    // attacker intersect the two releases down to the 2 F records
    val df = Seq(
      (1L, "E", "Z"), (2L, "E", "Z"), (3L, "E", "Z"), (4L, "E", "Z"),
      (5L, "F", "Z"), (6L, "F", "Z")).toDF("id", "city", "region")
    val l = Anonymize.generalizationLevels(df, Seq(col("city")),
        Seq(col("region")), 4)
      .select(col("id"), col("anon_level"))
      .as[(Long, Int)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(l(_) == 1))
    assert(Seq(5L, 6L).forall(l(_) == 9))
  }

  test("published classes always hold >= k records") {
    for (k <- 1 to 5) {
      val lev = Anonymize.generalizationLevels(recs, Seq(col("city")),
        Seq(col("region")), k)
      val l1 = lev.filter(col("anon_level") === 1)
        .groupBy(col("city")).count().as[(String, Long)].collect()
      assert(l1.forall(_._2 >= k), s"k=$k level-1 class under k")
      val l2 = lev.filter(col("anon_level") === 2)
        .groupBy(col("region")).count().as[(String, Long)].collect()
      assert(l2.forall(_._2 >= k), s"k=$k level-2 class under k")
    }
  }

  test("k=1 publishes everything at level 1") {
    assert(levels(1).values.forall(_ == 1))
  }

  // --- lDiversity (q205) ---

  // (id, zip, segment): G1 big+diverse, G2 big+homogeneous (the
  // attack k-anonymity alone misses), G3 small+diverse
  private def ldRecs = Seq(
    (1L, 10, "A"), (2L, 10, "B"), (3L, 10, "C"), (4L, 10, "A"),
    (5L, 10, "B"),
    (6L, 20, "A"), (7L, 20, "A"), (8L, 20, "A"), (9L, 20, "A"),
    (10L, 20, "A"), (11L, 20, "A"),
    (12L, 30, "A"), (13L, 30, "B")
  ).toDF("id", "zip", "seg")

  private def ldiv(k: Int, l: Int): Map[Long, (Long, Long, Boolean)] =
    Anonymize.lDiversity(ldRecs, Seq(col("zip")), col("seg"), k, l)
      .select(col("id"), col("anon_n"), col("anon_div"), col("anon_ok"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("l-diversity: big diverse class publishes") {
    val m = ldiv(4, 3)
    assert(m(1L) == ((5L, 3L, true)))
  }

  test("l-diversity: homogeneous class fails despite size >= k") {
    val m = ldiv(4, 3)
    assert(m(6L) == ((6L, 1L, false)))
  }

  test("l-diversity: small class fails despite diversity l'=2") {
    val m = ldiv(4, 2)
    assert(m(12L) == ((2L, 2L, false)))
  }

  test("l-diversity: l=1 reduces to pure k-anonymity") {
    val m = ldiv(4, 1)
    assert(m(1L)._3 && m(6L)._3 && !m(12L)._3)
  }

  // --- rrReported (q206) ---

  test("randomized response: report = truth XOR md5-derived flip") {
    val df = spark.range(0, 500).toDF("k")
      .select(col("k"), (col("k") % 2 === 0).as("truth"))
      .withColumn("rep", Anonymize.rrReported(col("truth"), col("k")))
      .withColumn("flip",
        conv(substring(md5(col("k").cast("string")), 1, 8), 16, 10)
          .cast("long") % 4 === 0)
    val bad = df.filter(
      (col("flip") && col("rep") === col("truth").cast("int")) ||
      (!col("flip") && col("rep") =!= col("truth").cast("int"))).count()
    assert(bad == 0)
    // the coin must actually flip sometimes, at roughly rate 1/4
    val flips = df.filter(col("flip")).count()
    assert(flips > 80 && flips < 170, s"flip count $flips")
  }

  test("randomized response: integer debias recovers the true count") {
    val n = 2000L
    val agg = spark.range(0, n).toDF("k")
      .select((col("k") % 3 === 0).as("truth"), col("k"))
      .select(col("truth").cast("int").as("t"),
        Anonymize.rrReported(col("truth"), col("k")).as("rep"))
      .agg(sum(col("t")).as("truth"), sum(col("rep")).as("rep"))
      .as[(Long, Long)].head()
    val est2 = 4 * agg._2 - n
    val band = 7 * math.floor(math.sqrt(n.toDouble)).toLong + 7
    assert(math.abs(est2 - 2 * agg._1) <= band,
      s"est2=$est2 truth2=${2 * agg._1} band=$band")
  }

  // ---- t-closeness (q211) ----

  /** (class, sensitive-bucket) rows → per-class (num, den, ok). */
  private def tc(rows: Seq[(String, Long)], tNum: Long, tDen: Long)
      : Map[String, (Long, Long, Boolean)] =
    Anonymize.tClosenessOrdered(
        rows.toDF("cls", "sb"), Seq("cls"), "sb", tNum, tDen)
      .select(col("cls"), col("emd_num"), col("emd_den"),
        col("anon_ok"))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("t-closeness: a class mirroring the global distribution has EMD 0") {
    // two identical classes → each IS the global distribution
    val rows = for (c <- Seq("a", "b"); s <- 0L to 3L) yield (c, s)
    val m = tc(rows, 0, 1) // even t = 0 publishes an exact mirror
    assert(m("a") == ((0L, 3L * 4 * 8, true)))
    assert(m("b")._3)
  }

  test("t-closeness: EMD matches the hand-computed cumulative form") {
    // global over {0,1}: a=(2,0), b=(1,1) → N=4, m=2, g=(3,1)
    // class a: C1 = 2*4 - 3*2 = 2 → num=2, den=1*2*4=8 → EMD=1/4
    // class b: C1 = 1*4 - 3*2 = -2 → num=2, den=8 → EMD=1/4
    val rows = Seq(("a", 0L), ("a", 0L), ("b", 0L), ("b", 1L))
    val m = tc(rows, 1, 4)
    assert(m("a") == ((2L, 8L, true)))   // 2*4 <= 8*1
    assert(m("b") == ((2L, 8L, true)))
    val strict = tc(rows, 1, 5)          // t = 1/5 < 1/4 → fail
    assert(!strict("a")._3 && !strict("b")._3)
  }

  test("t-closeness: ORDER matters — distance grows with displacement") {
    // skewed class concentrated at bucket 3 vs one at bucket 1,
    // same |p - q| per bucket but larger cumulative displacement
    val base = for (c <- Seq("x", "y"); s <- 0L to 3L) yield (c, s)
    val far = base ++ Seq.fill(4)(("far", 3L))
    val near = base ++ Seq.fill(4)(("near", 1L))
    val mFar = tc(far, 1, 1)
    val mNear = tc(near, 1, 1)
    // same den (same n, N, m) — compare nums directly
    assert(mFar("far")._2 == mNear("near")._2)
    assert(mFar("far")._1 > mNear("near")._1)
  }

  test("t-closeness: a class missing trailing domain values still audits") {
    // class "hole" never emits bucket 2; the domain join must still
    // charge it the full cumulative distance
    val rows = Seq(("a", 0L), ("a", 1L), ("a", 2L),
      ("hole", 0L), ("hole", 1L), ("hole", 1L))
    val m = tc(rows, 1, 1)
    // hole: c=(1,2,0), n=3, N=6, g=(2,3,1), m=3
    // C1 = 1*6-2*3 = 0; C2 = 0 + (2*6-3*3) = 3; C3 = 3 + (0-1*3) = 0
    assert(m("hole") == ((3L, 2L * 3 * 6, true)))
  }

  test("t-closeness: single-value domain is trivially 0-close") {
    val m = tc(Seq(("a", 5L), ("a", 5L), ("b", 5L)), 0, 1)
    assert(m.values.forall(v => v._1 == 0L && v._3))
  }
}
