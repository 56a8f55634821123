package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Quality-gate edge cases beyond the q75 oracle: empty inputs must
  * report ZERO violations (not NULL — SUM over zero rows is NULL
  * unless coalesced), and the single-scan shape must hold.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val checks = Seq(
    Quality.Check("neg", col("v") < 0),
    Quality.Check("null_k", col("k").isNull))

  test("rowChecks on an empty frame reports 0 violations per check") {
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val rows = Quality.rowChecks(empty, checks)
      .as[(String, Long)].collect().toMap
    assert(rows == Map("neg" -> 0L, "null_k" -> 0L))
  }

  test("rowChecks counts violations on non-empty input") {
    val df = Seq((1L, -1.0), (2L, 3.0), (3L, -2.0)).toDF("k", "v")
    val rows = Quality.rowChecks(df, checks)
      .as[(String, Long)].collect().toMap
    assert(rows == Map("neg" -> 2L, "null_k" -> 0L))
  }

  test("report unions row checks with empty-input extra checks cleanly") {
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val rep = Quality.report(empty, checks,
      extra = Seq(Quality.uniquenessCheck(empty, Seq("k"), "dup_k")))
      .as[(String, Long)].collect().toMap
    assert(rep == Map("neg" -> 0L, "null_k" -> 0L, "dup_k" -> 0L))
  }

  test("rowChecks compiles all checks into one scan (single aggregate)") {
    val df = Seq((1L, -1.0)).toDF("k", "v")
    val plan = Quality.rowChecks(df, checks)
      .queryExecution.executedPlan.toString
    // adding a check adds an aggregate column, never another scan
    assert(!plan.contains("Union"))
  }

  test("profile: both variants plan Expand-free; exact variant verifies the sketch") {
    val li = Tables.lineitem(spark, sf())
    // 100 TB form: per-column HLL states in a plain partial+final
    // aggregate — the multi-countDistinct Expand must be gone
    val sketchOnly = Quality.profile(li,
      Seq("l_quantity"), Seq("l_returnflag"), exact = false)
    assert(!sketchOnly.queryExecution.executedPlan.toString
      .contains("Expand"), "sketch-only profile grew an Expand")
    // verification form: the exact distincts run as SEPARATE
    // single-distinct two-phase aggregates (one-column pruned scans)
    // joined back broadcast — the multi-countDistinct Expand (which
    // replicates every row once per column) must never come back
    val exact = Quality.profile(li,
      Seq("l_quantity"), Seq("l_returnflag"))
    assert(!exact.queryExecution.executedPlan.toString.contains("Expand"),
      "exact profile regrew the multi-countDistinct Expand")
    // and the sketch verdicts hold on real data
    val rows = exact.select("col_name", "approx_ok")
      .as[(String, Boolean)].collect().toMap
    assert(rows.values.forall(identity), s"sketch out of band: $rows")
  }

  test("profile: raw sketch relative error recorded per column (q134 diagnostic)") {
    // q134's driver-hashed contract is only the within-15%-band
    // BOOLEAN of each engine's own sketch; if an estimator drifts
    // across versions the hash gate fails without saying by how much.
    // This spec records the raw Spark-side relative error so a band
    // breach is diagnosable here first, with the number in the
    // failure message.
    val li = Tables.lineitem(spark, sf())
    val cols = Seq("l_orderkey", "l_quantity", "l_discount", "l_returnflag")
    val errs = cols.map { c =>
      val (est, exact) = li
        .agg(approx_count_distinct(col(c)), countDistinct(col(c)))
        .as[(Long, Long)].collect().head
      val rel = math.abs(est - exact).toDouble / exact
      info(f"q134 sketch diag: $c%-12s exact=$exact%d est=$est%d rel_err=$rel%.4f")
      c -> rel
    }
    errs.foreach { case (c, rel) =>
      assert(rel <= 0.15, f"HLL sketch for $c drifted out of q134's 15%% band: rel_err=$rel%.4f")
    }
  }

  test("profile: duplicate column across the two lists fails fast") {
    val li = Tables.lineitem(spark, sf())
    val e = intercept[IllegalArgumentException] {
      Quality.profile(li, Seq("l_quantity"), Seq("l_quantity"))
    }
    assert(e.getMessage.contains("l_quantity"), e.getMessage)
  }

  test("equiDepthHistogram: even spread fills all k buckets evenly") {
    // values 0..7, 2 rows each, k=4 -> buckets of exactly 4 rows
    val df = (0 until 8).flatMap(v => Seq(v, v)).toDF("x")
    val got = Quality.equiDepthHistogram(df, "x", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toList
    assert(got === List((0L, 0, 1, 4L), (1L, 2, 3, 4L),
      (2L, 4, 5, 4L), (3L, 6, 7, 4L)))
  }

  test("equiDepthHistogram: a heavy hitter owns its bucket span") {
    // 12 rows: value 5 has 9 of them (> n/k = 3); k=4
    // prefix counts: v=1 cb=0 -> b0; v=5 cb=2 -> b0(2*4//12=0);
    // v=9 cb=11 -> b3. buckets 1 and 2 are skipped by design.
    val df = (Seq(1, 1) ++ Seq.fill(9)(5) ++ Seq(9)).toDF("x")
    val got = Quality.equiDepthHistogram(df, "x", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toList
    assert(got === List((0L, 1, 5, 11L), (3L, 9, 9, 1L)))
  }

  test("equiDepthHistogram: nulls are excluded, k=1 degenerates") {
    val df = Seq(Some(3), None, Some(7), Some(5)).toDF("x")
    val got = Quality.equiDepthHistogram(df, "x", 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toList
    assert(got === List((0L, 3, 7, 3L)))
  }

  test("equiDepthHistogram: pre-binning bounds cardinality past the guard") {
    // 1000 distinct continuous values would trip maxDistinct = 100;
    // a 10-unit grid folds them to 100 cells and the histogram runs
    val df = (0 until 1000).map(i => i + 0.25).toDF("x")
    intercept[IllegalArgumentException] {
      Quality.equiDepthHistogram(df, "x", 4, maxDistinct = 100)
        .collect()
    }
    val got = Quality.equiDepthHistogram(df, "x", 4,
        maxDistinct = 100, preBinCell = 10.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getDouble(2), r.getLong(3))).toList
    // 100 cells x 10 rows, k=4 -> 25 cells per bucket, grid-edge
    // bounds; depth is exactly n/k at cell granularity
    assert(got === List(
      (0L, 0.0, 240.0, 250L), (1L, 250.0, 490.0, 250L),
      (2L, 500.0, 740.0, 250L), (3L, 750.0, 990.0, 250L)))
  }
}
