package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Unit semantics for [[Cdc.maintainAgg]] (q197): the delta algebra
  * per op, group-moving updates, group birth/death, and the IVM
  * theorem maintain(view(base), Δ) == view(apply(base, Δ)) on a
  * randomized batch.
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def baseDf: DataFrame = Seq(
    (1L, "a", 10.00), (2L, "a", 5.50), (3L, "b", 7.25))
    .toDF("k", "g", "v")

  private def run(cdc: Seq[(Long, String, String, Double)]) =
    Cdc.maintainAgg(Cdc.aggOf(baseDf, "g", "v", 2), baseDf,
        cdc.toDF("k", "op", "g", "v"), "k", "op", "g", "v", 2)
      .orderBy("g")
      .select(col("g"), col("cnt"), col("s").cast("double"))
      .as[(String, Long, Double)].collect().toList

  test("insert adds to its group; new group is born") {
    assert(run(Seq((4L, "i", "c", 2.00))) ===
      List(("a", 2L, 15.50), ("b", 1L, 7.25), ("c", 1L, 2.00)))
  }

  test("delete removes the old image; emptied group disappears") {
    assert(run(Seq((3L, "d", "b", 0.0))) === List(("a", 2L, 15.50)))
  }

  test("same-group update nets count 0 and moves the value") {
    assert(run(Seq((1L, "u", "a", 12.00))) ===
      List(("a", 2L, 17.50), ("b", 1L, 7.25)))
  }

  test("group-moving update debits the old group, credits the new") {
    assert(run(Seq((2L, "u", "b", 5.50))) ===
      List(("a", 1L, 10.00), ("b", 2L, 12.75)))
  }

  test("maintain == recompute on a mixed randomized batch") {
    val n = 200
    val base = (1L to n).map(k =>
      (k, s"g${k % 7}", (k * 37 % 1000) / 100.0)).toDF("k", "g", "v")
    // deterministic mixed batch: delete k%11==0, update k%11∈{1,2}
    // (2 moves group), insert fresh keys
    val cdc =
      (1L to n).flatMap { k =>
        if (k % 11 == 0) Some((k, "d", s"g${k % 7}", 0.0))
        else if (k % 11 == 1) Some((k, "u", s"g${k % 7}", 9.99))
        else if (k % 11 == 2) Some((k, "u", s"g${(k + 3) % 7}",
          (k * 13 % 500) / 100.0))
        else None
      } ++ (n + 1 to n + 30).map(k =>
        (k.toLong, "i", s"g${k % 7}", (k * 7 % 300) / 100.0))
    val maintained = Cdc.maintainAgg(Cdc.aggOf(base, "g", "v", 2),
        base, cdc.toDF("k", "op", "g", "v"), "k", "op", "g", "v", 2)
      .orderBy("g").select(col("g"), col("cnt"),
        col("s").cast("double"))
      .as[(String, Long, Double)].collect().toList
    // recompute: apply the batch row-wise, aggregate from scratch
    val deleted = cdc.filter(c => c._2 == "d" || c._2 == "u")
      .map(_._1).toSet
    val applied = (1L to n).filterNot(k => deleted.contains(k))
      .map(k => (k, s"g${k % 7}", (k * 37 % 1000) / 100.0)) ++
      cdc.filter(c => c._2 == "u" || c._2 == "i")
        .map(c => (c._1, c._3, c._4))
    val recomputed = Cdc.aggOf(applied.toDF("k", "g", "v"), "g", "v", 2)
      .orderBy("g").select(col("g"), col("cnt"),
        col("s").cast("double"))
      .as[(String, Long, Double)].collect().toList
    assert(maintained === recomputed)
  }
}
