package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.plans.MvRegistry
import graft.queries.Q

/** Plan + semantics contract of the materialized-view rewrite
  * ([[graft.plans.MvRewrite]], q207): a conforming rollup must stop
  * scanning the fact parquet and read the summary RDD instead, with
  * bit-identical results; anything outside the documented scope must
  * be left alone (and therefore still correct).
  */
class MvRewriteSpec extends SparkSpec with BeforeAndAfterEach {

  override def afterEach(): Unit = MvRegistry.clear()

  private def li = Tables.lineitem(spark, sf())

  private def revenueTerm =
    round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
      .cast("decimal(18,4)")

  private def registerMv(): Unit = {
    val summary = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(revenueTerm).as("sum_rev"), count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    MvRegistry.register(li,
      dims = Map("l_returnflag" -> "l_returnflag",
        "l_linestatus" -> "l_linestatus"),
      sums = Seq(revenueTerm -> "sum_rev"), cnt = Some("cnt"),
      summary = summary)
  }

  private def scansLineitem(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("lineitem.parquet")

  private def rollup: DataFrame = li
    .groupBy(col("l_returnflag"))
    .agg(Q.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"),
      count(lit(1)).as("n_items"))
    .orderBy(col("l_returnflag"))

  test("conforming rollup reads the summary, not the fact scan") {
    val before = rollup.collect()
    registerMv()
    val after = rollup
    assert(!scansLineitem(after), after.queryExecution.executedPlan)
    assert(after.queryExecution.executedPlan.toString
      .contains("ExistingRDD"))
    assert(after.collect().toSeq == before.toSeq)
  }

  test("dim filter rides the rewrite and stays correct") {
    val q = () => li.filter(col("l_returnflag") =!= "N")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    val before = q().collect()
    registerMv()
    assert(!scansLineitem(q()))
    assert(q().collect().toSeq == before.toSeq)
  }

  test("grouping by ALL dims (no rollup) also answers from the MV") {
    val q = () => li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")),
        4).as("revenue"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    val before = q().collect()
    registerMv()
    assert(!scansLineitem(q()))
    assert(q().collect().toSeq == before.toSeq)
  }

  test("unregistered measure leaves the plan untouched") {
    registerMv()
    // avg is outside the recorded measures → full-coverage rule bails
    val q = li.groupBy(col("l_returnflag"))
      .agg(avg(col("l_tax")).as("t"))
    assert(scansLineitem(q))
  }

  test("filter on a NON-dim column leaves the plan untouched") {
    registerMv()
    val q = li.filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    assert(scansLineitem(q))
  }

  test("grouping by a non-dim column leaves the plan untouched") {
    registerMv()
    val q = li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
    assert(scansLineitem(q))
  }

  test("distinct aggregate leaves the plan untouched") {
    registerMv()
    val q = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_linestatus")).as("n"))
    assert(scansLineitem(q))
  }

  test("a different table's aggregate is never rewritten") {
    registerMv()
    val q = Tables.orders(spark, sf())
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(scansLineitem(q) == false &&
      q.queryExecution.executedPlan.toString.contains("orders.parquet"))
  }

  test("conf gate disables the rewrite") {
    registerMv()
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try assert(scansLineitem(rollup))
    finally spark.conf.set("spark.graft.mv.rewrite", "true")
  }

  test("empty registry is inert") {
    assert(scansLineitem(rollup))
  }

  test("incrementally maintained summary serves as the MV of the " +
      "maintained base (IVM x MV-answering composition)") {
    import graft.operators.Cdc
    // initial base = orders with bucket < 80; CDC inserts the rest
    // and deletes bucket < 10 → effective base = bucket in [10, 100)
    val bucket = graft.operators.Splits.hashBucket(col("o_orderkey"))
    val all = Tables.orders(spark, sf())
    val initial = all.filter(bucket < 80)
    val baseAgg = Cdc.aggOf(initial, "o_orderstatus", "o_totalprice", 2)
    val cdc = all.filter(bucket >= 80)
      .select(col("o_orderkey"), lit("i").as("op"),
        col("o_orderstatus"), col("o_totalprice"))
      .unionByName(all.filter(bucket < 10)
        .select(col("o_orderkey"), lit("d").as("op"),
          col("o_orderstatus"), col("o_totalprice")))
    val maintained = Cdc.maintainAgg(baseAgg, initial, cdc,
        "o_orderkey", "op", "o_orderstatus", "o_totalprice", 2)
      .localCheckpoint(true)
    // materialize the maintained base as the file the MV answers for
    val dir = java.nio.file.Files
      .createTempDirectory("mv_ivm").toString + "/eff.parquet"
    all.filter(bucket >= 10).write.mode("overwrite").parquet(dir)
    val eff = spark.read.parquet(dir)
    MvRegistry.register(eff,
      dims = Map("o_orderstatus" -> "o_orderstatus"),
      sums = Seq(round(col("o_totalprice"), 2).cast("decimal(18,2)")
        -> "s"),
      cnt = Some("cnt"), summary = maintained)
    val q = eff.groupBy(col("o_orderstatus"))
      .agg(Q.dsum(col("o_totalprice"), 2).as("rev"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
    assert(!q.queryExecution.executedPlan.toString.contains("eff.parquet"))
    val direct = all.filter(bucket >= 10)
      .groupBy(col("o_orderstatus"))
      .agg(Q.dsum(col("o_totalprice"), 2).as("rev"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
      .collect().toSeq
    assert(q.collect().toSeq == direct)
  }

  test("decimal partial-sum rollup is bit-identical to the direct sum") {
    val direct = li.groupBy(col("l_returnflag"))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")),
        4).as("revenue"))
      .orderBy(col("l_returnflag"))
      .collect().toSeq
    registerMv()
    val viaMv = rollup.select(col("l_returnflag"), col("revenue"))
      .collect().toSeq
    assert(viaMv == direct)
  }

  // ---- r11 guard regressions (the ADVICE fixes) ----

  test("two rewritable Aggregates in one tree: neither rewrites " +
      "(duplicate summary exprIds must never be grafted twice)") {
    registerMv()
    val a = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_a"))
    val b = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_b"))
    val joined = a.join(b, Seq("l_returnflag"))
      .orderBy(col("l_returnflag"))
    // each aggregate alone rewrites; together they must bail — and
    // the un-rewritten plan is still correct
    assert(!scansLineitem(li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))))
    assert(scansLineitem(joined),
      joined.queryExecution.executedPlan)
    val rows = joined.collect()
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("nondeterministic filter (no column references) blocks the " +
      "rewrite instead of re-evaluating over summary rows") {
    registerMv()
    // not always-true (Spark 4 folds rand() < 2.0 away entirely);
    // the surviving nondeterministic Filter must block the rewrite
    val q = li.filter(rand(7) < 0.9999)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    assert(scansLineitem(q), q.queryExecution.executedPlan)
  }

  test("global COUNT(*) over a filter that kills every summary row " +
      "returns 0, not NULL") {
    registerMv()
    val q = li.filter(col("l_returnflag") === "ZZ")
      .agg(count(lit(1)).as("n"))
    assert(!scansLineitem(q), q.queryExecution.executedPlan)
    val r = q.collect()
    assert(r.length == 1 && !r(0).isNullAt(0) && r(0).getLong(0) == 0L)
  }

  test("files changing under the registered path make the rewrite " +
      "refuse (staleness fingerprint)") {
    // register an MV over a COPY of lineitem we can append to
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mv-stale").toString + "/fact"
    li.limit(500).write.parquet(dir)
    val fact = spark.read.parquet(dir)
    val summary = fact.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt")).localCheckpoint(true)
    MvRegistry.register(fact,
      dims = Map("l_returnflag" -> "l_returnflag"),
      sums = Nil, cnt = Some("cnt"), summary = summary)
    def q = spark.read.parquet(dir).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n")).orderBy(col("l_returnflag"))
    assert(!q.queryExecution.executedPlan.toString.contains("fact"),
      "pre-append: answers from the summary")
    // append more rows at the same path — the fingerprint changes
    li.limit(100).write.mode("append").parquet(dir)
    val after = q
    assert(after.queryExecution.executedPlan.toString.contains("fact"),
      "post-append: must scan the (changed) base, not the stale MV")
    assert(after.agg(sum(col("n"))).collect()(0).getLong(0) == 600L)
  }
}
