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
}
