package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Qry, Tables}
import graft.operators.AsOfJoin
import Q._

/** Join surface (SURVEY.md §2.B G2-G4): broadcast hash join of small
  * dims, shuffled sort-merge join fact⋈fact, outer joins with
  * null-handling, semi/anti existence joins, non-equi range join
  * against a broadcast interval table, and an as-of temporal join.
  *
  * Scale notes per query are on each Qry; the common rule: dims
  * (region/nation/part/supplier bands) are broadcast — no shuffle of
  * the fact side; fact⋈fact shuffles both sides on the join key once
  * and AQE handles skew/coalescing.
  */
object Joins {

  /** Star join: fact lineitem ⋈ broadcast dims part+supplier+nation.
    * At 100 TB the fact table never shuffles — all three dims ride
    * along as broadcast hash maps (G2). */
  val q12 = Qry(
    "q12_join_broadcast_star",
    (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val sup = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("p_brand"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"), col("p_brand"))
    },
    Some(s"""
      SELECT n_name, p_brand,
             ${dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name, p_brand
      ORDER BY n_name, p_brand"""))

  /** Fact⋈fact: orders ⋈ lineitem on orderkey — too big to broadcast
    * either side at scale, so both shuffle on l_orderkey/o_orderkey and
    * sort-merge (G3). The distinct-order count is computed as a
    * TWO-PHASE re-aggregation instead of `countDistinct`: first group
    * by (priority, flag, orderkey) — satisfied WITHOUT a shuffle
    * because the join output is already hash-partitioned by orderkey
    * (a superset-clustering Catalyst recognizes) — then re-aggregate
    * the small per-order rows. This removes the Expand operator the
    * distinct-aggregate rewrite would inject (which triples the rows
    * entering the wide shuffle) — the standard at-scale pattern for
    * mixed distinct/plain aggregates. */
  val q13 = Qry(
    "q13_join_sortmerge_facts",
    (s: SparkSession, d: String) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"), col("l_returnflag"),
          col("o_orderkey"))
        .agg(
          count(lit(1)).as("__n"),
          // partial stays DECIMAL (exact) — only the final sum casts
          // to double, keeping the cross-engine dsum contract
          sum(round(col("l_quantity"), 2).cast("decimal(18,2)"))
            .as("__q"))
        .groupBy(col("o_orderpriority"), col("l_returnflag"))
        .agg(
          sum(col("__n")).as("n_items"),
          count(lit(1)).as("n_orders"),
          sum(col("__q")).cast("double").as("sum_qty"))
        .orderBy(col("o_orderpriority"), col("l_returnflag")),
    Some(s"""
      SELECT o_orderpriority, l_returnflag,
             COUNT(*) AS n_items,
             COUNT(DISTINCT o_orderkey) AS n_orders,
             ${dsumSql("l_quantity", 2)} AS sum_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority, l_returnflag
      ORDER BY o_orderpriority, l_returnflag"""))

  /** Left outer join + null-aware aggregates: every customer, even
    * order-less ones (count=0). Aggregate-then-join keeps the outer
    * side skinny; the order-count agg is partial+final (G2/G5). */
  val q14 = Qry(
    "q14_join_left_outer",
    (s: SparkSession, d: String) => {
      val perCust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice"), 2).as("spend"))
      Tables.customer(s, d)
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(when(col("n_orders").isNull, 1).otherwise(0))
            .as("n_inactive"),
          dsum(coalesce(col("spend"), lit(0d)), 2).as("segment_spend"))
        .orderBy(col("c_mktsegment"))
    },
    Some(s"""
      WITH per_cust AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               ${dsumSql("o_totalprice", 2)} AS spend
        FROM orders GROUP BY o_custkey)
      SELECT c_mktsegment,
             COUNT(*) AS n_customers,
             CAST(SUM(CASE WHEN n_orders IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_inactive,
             ${dsumSql("COALESCE(spend, 0)", 2)} AS segment_spend
      FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Existence joins: left-semi (customers WITH an urgent order) and
    * left-anti (customers WITHOUT), tagged and unioned. Semi/anti
    * shuffle only distinct keys of the probe side (G2). */
  val q15 = Qry(
    "q15_join_semi_anti",
    (s: SparkSession, d: String) => {
      val c = Tables.customer(s, d)
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val withU = c.join(urgent, col("c_custkey") === col("o_custkey"),
        "left_semi").withColumn("tag", lit("has_urgent"))
      val without = c.join(urgent, col("c_custkey") === col("o_custkey"),
        "left_anti").withColumn("tag", lit("no_urgent"))
      withU.unionByName(without)
        .groupBy(col("tag"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal"), 2).as("bal"))
        .orderBy(col("tag"), col("c_mktsegment"))
    },
    Some(s"""
      WITH urgent AS (SELECT o_custkey FROM orders
                      WHERE o_orderpriority = '1-URGENT')
      SELECT tag, c_mktsegment, COUNT(*) AS n,
             ${dsumSql("c_acctbal", 2)} AS bal
      FROM (
        SELECT 'has_urgent' AS tag, c_mktsegment, c_acctbal FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM urgent)
        UNION ALL
        SELECT 'no_urgent' AS tag, c_mktsegment, c_acctbal FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM urgent)) t
      GROUP BY tag, c_mktsegment ORDER BY tag, c_mktsegment"""))

  /** Non-equi range join (G4): orders banded by a tiny interval table
    * of price tiers. The tier table is broadcast, so the theta join is
    * a broadcast-nested-loop over 4 rows — constant work per fact row,
    * no shuffle of the fact side at any scale. */
  val q16 = Qry(
    "q16_join_range_bands",
    (s: SparkSession, d: String) => {
      val bands = s.createDataFrame(
        java.util.Arrays.asList(
          Row("T1_small", 0d, 50000d),
          Row("T2_mid", 50000d, 150000d),
          Row("T3_large", 150000d, 300000d),
          Row("T4_huge", 300000d, 1e9)),
        StructType(Seq(
          StructField("tier", StringType, nullable = false),
          StructField("lo", DoubleType, nullable = false),
          StructField("hi", DoubleType, nullable = false))))
      Tables.orders(s, d)
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice"), 2).as("tier_total"))
        .orderBy(col("tier"))
    },
    Some(s"""
      WITH bands(tier, lo, hi) AS (VALUES
        ('T1_small', 0.0, 50000.0), ('T2_mid', 50000.0, 150000.0),
        ('T3_large', 150000.0, 300000.0), ('T4_huge', 300000.0, 1e9))
      SELECT tier, COUNT(*) AS n_orders,
             ${dsumSql("o_totalprice", 2)} AS tier_total
      FROM orders JOIN bands
        ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY tier ORDER BY tier"""))

  /** As-of temporal join (G4, operator the reference lacks): for each
    * purchase event, the most recent signup at-or-before it by the
    * same user. Uses [[graft.operators.AsOfJoin]] — union + one
    * window shuffle, never a nested-loop theta join. Oracle is
    * DuckDB's native ASOF JOIN. */
  val q17 = Qry(
    "q17_join_asof",
    (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"),
          col("event_id").as("signup_event_id"))
      AsOfJoin.asOf(purchases, signups, key = "user_id", ts = "ts",
          payload = Seq("signup_event_id"),
          tiebreak = Seq("signup_event_id"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("value"),
          coalesce(col("signup_event_id"), lit(-1L)).as("signup_event_id"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH purchases AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'),
      signups AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               event_id AS signup_event_id
        FROM events WHERE event_type = 'signup')
      SELECT p.event_id, p.user_id,
             STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
             p.value,
             COALESCE(s.signup_event_id, -1) AS signup_event_id
      FROM purchases p
      ASOF LEFT JOIN signups s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id"""))

  /** Runtime bloom-filter join pruning (q126): a selective dim-side
    * filter (urgent orders) joined to the fact side with broadcast
    * disabled — the shape where Spark's `InjectRuntimeFilter` builds
    * a bloom filter over the filtered creation side's join keys and
    * plants `might_contain` on the fact scan, so most lineitem rows
    * die BEFORE the join's shuffle. At 100 TB this is the difference
    * between shuffling the whole fact table and shuffling the ~20%
    * that can possibly match; on a real warehouse it composes with
    * DPP (partition-level pruning) as the row-level second stage.
    *
    * Runs in an isolated `newSession` so the injection thresholds
    * (tuned down: the test tables sit below the 10 GB default
    * application-side threshold) never leak into other queries.
    * Results are bloom-false-positive-proof by construction — the
    * filter only PRUNES; the join still verifies every key — which
    * is exactly what the oracle checks. The injection itself is
    * plan-locked in PlanShapeSpec. */
  val q126 = Qry(
    "q126_runtime_filter",
    (s: SparkSession, d: String) => {
      val ns = s.newSession()
      ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ns.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      ns.conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      val urgent = Tables.orders(ns, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      Tables.lineitem(ns, d)
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice"), 2).as("revenue"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      SELECT l_returnflag, COUNT(*) AS n,
             ${dsumSql("l_extendedprice", 2)} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** q249 — explicit Bloom-pruned fact⋈dim join
    * ([[graft.operators.BloomJoin.bloomPrunedEquiJoin]]): lineitem
    * joined to a SELECTIVE supplier subset (top acctbal band) with
    * the fact side pruned by a broadcast `bloom_agg` filter BEFORE
    * the join shuffle — Spark's own runtime-filter kernel composed
    * explicitly where `InjectRuntimeFilter`'s heuristics can't see
    * the join. False positives only ever reach the exact join, so
    * the oracle is the PLAIN join — result equality IS the
    * correctness proof of the pruning. */
  val q249 = Qry(
    "q249_bloom_pruned_join",
    (s: SparkSession, d: String) => {
      val dim = Tables.supplier(s, d)
        .filter(col("s_acctbal") > 5000.0)
        .select(col("s_suppkey"), col("s_nationkey"))
      graft.operators.BloomJoin.bloomPrunedEquiJoin(
          Tables.lineitem(s, d)
            .select(col("l_suppkey"), col("l_extendedprice"),
              col("l_discount")),
          "l_suppkey", dim, "s_suppkey", expectedItems = 100000L)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          Q.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")),
            4).as("revenue"))
        .orderBy(col("s_nationkey"))
    },
    Some("""
      SELECT s_nationkey,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount),
               4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN (SELECT s_suppkey, s_nationkey FROM supplier
            WHERE s_acctbal > 5000.0) s
        ON l_suppkey = s_suppkey
      GROUP BY s_nationkey
      ORDER BY s_nationkey"""))

  val all: Seq[Qry] = Seq(q12, q13, q14, q15, q16, q17, q126, q249)
}
