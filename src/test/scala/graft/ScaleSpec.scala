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

  test("count-min sketch never underestimates ANY vocabulary token and stays in band") {
    // q121 hashes the contract for the top-15 only; here the CMS
    // guarantee is swept across the ENTIRE vocabulary: row-wise min
    // of overcounting counters can never go below the true count, and
    // the fixed-seed overestimate stays within 2·ε·N everywhere.
    import graft.operators.TextOps
    val toks = Tables.documents(spark, sf())
      .select(explode(TextOps.tokens($"text")).as("tok"))
    val one = toks.agg(
      expr("count_min_sketch(tok, CAST(0.0005 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)").as("cms"),
      count(lit(1)).as("total")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(one.getAs[Array[Byte]](0)))
    val total = one.getLong(1)
    val band = math.ceil(2 * 0.0005 * total).toLong
    val vocab = toks.groupBy($"tok").count().as[(String, Long)].collect()
    assert(vocab.nonEmpty)
    vocab.foreach { case (tok, exact) =>
      val est = cms.estimateCount(tok)
      assert(est >= exact, s"CMS UNDERestimated '$tok': $est < $exact")
      assert(est <= exact + band,
        s"CMS overshoot for '$tok': $est > $exact + $band")
    }
  }

  test("approx_percentile within the ±2% exact rank band") {
    // the tight accuracy claim lives HERE, not in the q66 hash (the
    // hashed band is the flip-proof ±5%); accuracy=10000 guarantees
    // rank error ≤ 1e-4, so this is 200× slack even at sf0.001
    val rows = Tables.orders(spark, sf())
      .groupBy($"o_orderstatus")
      .agg(
        expr("percentile(o_totalprice, array(0.48,0.52,0.88,0.92,0.95,0.99))")
          .as("ex"),
        expr("approx_percentile(o_totalprice, array(0.5,0.9,0.97), 10000)")
          .as("ap"))
      .as[(String, Seq[Double], Seq[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, ex, ap) =>
      assert(ap(0) >= ex(0) && ap(0) <= ex(1))
      assert(ap(1) >= ex(2) && ap(1) <= ex(3))
      assert(ap(2) >= ex(4) && ap(2) <= ex(5))
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

  test("HLL shard-merge estimate tracks the direct one-pass sketch") {
    // the q115 claim: union of per-shard sketch states loses nothing
    // vs sketching the whole input in one pass (same lgK)
    import graft.operators.Splits
    val ev = Tables.events(spark, sf()).withColumn("shard",
      Splits.hashBucket(col("event_id")) % 4)
    val merged = ev.groupBy($"event_type", $"shard")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("st"))
      .groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(st))").as("m"))
    val direct = ev.groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")
        .as("d"))
    val rows = merged.join(direct, "event_type")
      .select($"m", $"d").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (m, dv) =>
      assert(math.abs(m - dv) <= math.max(1L, (0.01 * dv).toLong),
        s"merged=$m direct=$dv drifted > 1%")
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // The production skew answer is layered: AQE's OptimizeSkewedJoin
    // splits oversized partitions at runtime with NO code change;
    // Skew.saltedJoin (above) is the static fallback for the cases
    // AQE can't touch (aggregations, broadcast-ineligible plans).
    // Thresholds are scoped down so a test-sized hot key (one key
    // carrying ~100x the median) triggers the same mechanism that
    // fires on a 100 TB hot-key shuffle.
    val s2 = spark.newSession()
    Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.shuffle.partitions" -> "4"
    ).foreach { case (k, v) => s2.conf.set(k, v) }
    import s2.implicits._
    // one hot key (0) with 50k rows, 50 cold keys with ~100 each
    val left = s2.range(55000)
      .select(when($"id" < 50000, 0L).otherwise($"id" % 50 + 1).as("k"),
        $"id".as("v"))
    val right = s2.range(51).select($"id".as("k"), ($"id" * 7).as("w"))
    val joined = left.join(right, "k")
    // materialize THIS Dataset's own QueryExecution (count() would
    // build a different one, leaving this adaptive plan unfinalized)
    assert(joined.collect().length == 55000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"OptimizeSkewedJoin did not fire:\n$finalPlan")
  }
}
