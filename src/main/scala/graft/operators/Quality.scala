package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate (the validation pass a production pipeline runs
  * before publishing a table): declarative violation checks compiled
  * into ONE conditional-aggregation scan — adding a check never adds
  * a scan — plus key-uniqueness and referential-orphan checks that
  * need their own (single-shuffle) shapes. Everything returns lazy
  * (check, n_violations) frames that union into one report; no
  * driver-side actions.
  */
object Quality {

  /** One named constraint; `violation` is TRUE for offending rows. */
  final case class Check(name: String, violation: Column)

  /** All row-level checks in one scan: conditional sums, then melted
    * to (check, n_violations) rows. Sums are coalesced to 0 so an
    * EMPTY input reports zero violations per check, not NULLs (SUM
    * over zero rows is NULL). */
  def rowChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val aggs = checks.map(c =>
      coalesce(sum(when(c.violation, 1L).otherwise(0L)), lit(0L))
        .as(c.name))
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array.empty[Column],
        checks.map(c => col(c.name)).toArray,
        "check_name", "n_violations")
  }

  /** Uniqueness: number of key values appearing more than once. */
  def uniquenessCheck(df: DataFrame, keys: Seq[String],
      name: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Referential integrity: child keys with no parent (left-anti). */
  def referentialCheck(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Full report: row checks + extra check frames, one result. */
  def report(df: DataFrame, checks: Seq[Check],
      extra: Seq[DataFrame] = Nil): DataFrame =
    extra.foldLeft(rowChecks(df, checks))(_ unionByName _)

  /** Per-column table profile (the ANALYZE/data-catalog pass): for
    * every listed column — row count, null count, exact distinct, an
    * approx-distinct sketch with its within-15%-band verdict (the
    * q48 flip-proof contract), and min/max for the numeric columns.
    * The sketch/null/min-max metrics come from ONE wide scan melted
    * to a row per column via an explode of per-column structs (pure
    * projection — the only exchange is the aggregate's own
    * partial/final pair).
    *
    * Scale note: the exact `countDistinct` verification legs are
    * SEPARATE per-column single-distinct aggregates over one-column
    * pruned scans — each plans as a plain two-phase hash aggregate
    * keyed on its own column, NEVER the multi-distinct Expand (which
    * replicates every row once per profiled column and carries the
    * full cross-column key cardinality through one exchange — the
    * shape that cost 26 s at sf1 and would never finish at 100 TB).
    * The N-row exact frame then broadcast-joins back into the melted
    * sketch frame. At 100 TB a profile runs the sketch-only variant
    * (`exact = false`) — one scan, HLL state per column, no second
    * pass; the exact legs exist to VERIFY the sketches cross-engine
    * at verification scale. */
  def profile(df: DataFrame, numericCols: Seq[String],
      otherCols: Seq[String], exact: Boolean = true): DataFrame = {
    val cols = numericCols.map(_ -> true) ++ otherCols.map(_ -> false)
    // the per-column agg aliases (__c_nn, __c_ad, ...) collide if a
    // column is listed twice (or in both lists) — fail with a clear
    // message instead of an opaque duplicate-alias AnalysisException
    require(cols.map(_._1).distinct.size == cols.size,
      s"profile: duplicate column(s) across numericCols/otherCols: " +
        cols.map(_._1).diff(cols.map(_._1).distinct).distinct.mkString(", "))
    val aggs = cols.flatMap { case (c, num) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}_nn"),
        approx_count_distinct(col(c), 0.02).as(s"__${c}_ad")) ++
        (if (num) Seq(
          min(col(c)).cast("double").as(s"__${c}_mn"),
          max(col(c)).cast("double").as(s"__${c}_mx")) else Nil)
    }
    val agged = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { case (c, num) =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__${c}_nn").as("n_null"),
        col(s"__${c}_ad").as("__n_approx"),
        (if (num) col(s"__${c}_mn")
         else lit(null).cast("double")).as("min_num"),
        (if (num) col(s"__${c}_mx")
         else lit(null).cast("double")).as("max_num"))
    }
    val melted =
      agged.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
    if (!exact)
      melted.select(col("col_name"), col("n_rows"), col("n_null"),
        col("__n_approx").as("n_distinct"), lit(true).as("approx_ok"),
        col("min_num"), col("max_num"))
    else {
      val exacts = cols.map { case (c, _) =>
        df.agg(countDistinct(col(c)).as("__nd"))
          .select(lit(c).as("col_name"), col("__nd"))
      }.reduce(_ unionByName _)
      melted.join(broadcast(exacts), Seq("col_name"))
        .select(col("col_name"), col("n_rows"), col("n_null"),
          col("__nd").as("n_distinct"),
          (abs(col("__n_approx") - col("__nd")) <=
            lit(0.15) * col("__nd")).as("approx_ok"),
          col("min_num"), col("max_num"))
    }
  }

  /** Equi-depth histogram (the ANALYZE-for-CBO statistic: bucket
    * boundaries chosen so each bucket holds ~n/k rows — what a
    * selectivity estimator wants where equi-WIDTH buckets collapse on
    * skew). Built rank-free from the VALUE-FREQUENCY table: for each
    * distinct value, the exclusive prefix count cb assigns bucket
    * floor(cb·k/n) — pure integer arithmetic, deterministic in any
    * engine, no percentile interpolation (whose float semantics
    * differ across engines). A value heavier than n/k spans its
    * bucket alone (following buckets may be empty — correct
    * equi-depth behavior under heavy hitters).
    *
    * Scale shape: the frequency table is one partial-aggregable
    * groupBy; the prefix-count window then runs over |distinct
    * values| rows — the operator's documented contract is BOUNDED
    * value cardinality (dictionary/measure columns; pre-bin
    * continuous columns to a fixed grid first, which is what
    * catalog stats collectors do). The contract is ENFORCED, not
    * just stated: before building the plan the distinct-value count
    * is probed and a violation fails loudly instead of silently
    * collapsing the window to one partition. The probe is one extra
    * partial-aggregable groupBy job per call — the LIMIT bounds only
    * the collected probe RESULT (a global limit above a hash
    * aggregate does not short-circuit the aggregation work). The
    * histogram itself is k rows.
    *
    * The pre-binning leg is BUILT IN for continuous columns: with
    * `preBinCell` > 0 every value first snaps DOWN to its grid cell
    * edge floor(v / cell) · cell (one identical IEEE div/floor/mul
    * chain in any engine), and the histogram runs over cell edges —
    * cardinality is bounded by the value range over the cell width
    * regardless of how many raw distinct values exist, which is
    * exactly what catalog stats collectors do before building
    * equi-depth bounds. lo/hi then report grid edges (the bucket's
    * lowest/highest occupied cell), and depth balance holds at cell
    * granularity: a cell heavier than n/k spans its bucket alone,
    * like any heavy value.
    *
    * @param maxDistinct cardinality ceiling for the guard
    *        (default 2M ≈ tens of MB of window state); pass 0 to
    *        skip the probe when the caller has already bounded it
    * @param preBinCell grid cell width for continuous columns
    *        (0 = exact values; the guard still enforces the
    *        POST-binning cardinality)
    * @return (bucket, lo, hi, n_rows) sorted by bucket */
  def equiDepthHistogram(df: DataFrame, column: String, k: Int,
      maxDistinct: Int = 2000000, preBinCell: Double = 0.0)
      : DataFrame = {
    require(k >= 1, s"equiDepthHistogram: k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val v =
      if (preBinCell > 0)
        floor(col(column) / lit(preBinCell)) * lit(preBinCell)
      else col(column)
    val freq = df.filter(col(column).isNotNull)
      .groupBy(v.as("v")).agg(count(lit(1)).as("c"))
    if (maxDistinct > 0) {
      val probed = freq.limit(maxDistinct + 1).count()
      require(probed <= maxDistinct,
        s"equiDepthHistogram($column): more than $maxDistinct " +
          "distinct values — the prefix-count window is single-" +
          "partition by contract; pre-bin continuous columns to a " +
          "bounded grid first (or raise maxDistinct deliberately)")
    }
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    freq
      .withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
      .crossJoin(broadcast(freq.agg(sum(col("c")).as("n"))))
      .withColumn("bucket", expr(s"cb * $k div n"))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("c")).as("n_rows"))
      .orderBy(col("bucket"))
  }
}
