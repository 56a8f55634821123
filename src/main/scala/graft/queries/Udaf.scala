package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.functions.Aggregators
import Q._

/** Custom typed-aggregator queries (SURVEY.md §2.B G16): the
  * Aggregator surface verified against plain SQL re-derivations.
  */
object Udaf {

  /** TopKMin aggregator: 3 cheapest order prices per status — a
    * bounded-buffer per-group top-k with map-side combine (the
    * shuffle carries ≤k doubles per group, whatever the group
    * size). Output exploded for hashing. */
  val q43 = Qry(
    "q43_udaf_topk",
    (s: SparkSession, d: String) => {
      val session = s
      import session.implicits._
      val topk = udaf(new Aggregators.TopKMin(3))
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(topk(col("o_totalprice")).as("top3"))
        .select(col("o_orderstatus"),
          posexplode(col("top3")).as(Seq("rank", "price")))
        .orderBy(col("o_orderstatus"), col("rank"))
    },
    Some("""
      WITH ranked AS (
        SELECT o_orderstatus, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice) AS rn
        FROM orders)
      SELECT o_orderstatus, rn - 1 AS rank, o_totalprice AS price
      FROM ranked WHERE rn <= 3
      ORDER BY o_orderstatus, rank"""))

  /** ExactMean aggregator: scaled-long exact mean vs the same value
    * derived with decimal SQL arithmetic. */
  val q44 = Qry(
    "q44_udaf_exact_mean",
    (s: SparkSession, d: String) => {
      val session = s
      import session.implicits._
      val mean2 = udaf(new Aggregators.ExactMean(2))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(mean2(col("l_extendedprice")), 6).as("mean_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      SELECT l_returnflag,
             ROUND((CAST(SUM(CAST(ROUND(l_extendedprice, 2) * 100
                     AS BIGINT)) AS DOUBLE) / 100)
               / CAST(COUNT(*) AS DOUBLE), 6) AS mean_price,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val all: Seq[Qry] = Seq(q43, q44)
}
