package graft


import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale techniques: salted agg equivalence, sketch accuracy, and
  * bucketed co-located joins (shuffle elimination). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join exactly (row multiset)") {
    val ev = Tables.events(spark, sf()).select($"event_id",
      $"event_type", $"value")
    val dim = ev.select($"event_type").distinct()
      .withColumn("code", substring(md5($"event_type"), 1, 8))
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"code")
        .as[(Long, String)].collect().sortBy(identity).toSeq
    val plain = sorted(ev.join(dim, Seq("event_type")))
    val salted = sorted(Skew.saltedJoin(ev, dim, "event_type",
      "event_id", 8))
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salted aggregation equals plain groupBy exactly") {
    val ev = Tables.events(spark, sf())
    val salted = Skew.saltedSumCount(ev, "event_type", "value",
        "event_id", 16)
      .orderBy($"event_type")
      .as[(String, Double, Long, Double, Double)].collect().toSeq
    val plain = ev.groupBy($"event_type")
      .agg(
        sum(round($"value", 2).cast("decimal(27,2)")).cast("double")
          .as("sum_value"),
        count(lit(1)).as("n"), min($"value"), max($"value"))
      .orderBy($"event_type")
      .as[(String, Double, Long, Double, Double)].collect().toSeq
    assert(salted == plain)
  }

  test("approx_count_distinct within rsd of exact") {
    val rows = Tables.events(spark, sf())
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id", 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    rows.foreach { case (_, exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.1)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    val a = (0L until 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (0L until 1000L).map(i => (i, i * 2.0)).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bt_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bt_b")
    val joined = s2.table("bt_a").join(s2.table("bt_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 1000)
    s2.sql("DROP TABLE IF EXISTS bt_a")
    s2.sql("DROP TABLE IF EXISTS bt_b")
  }
}
