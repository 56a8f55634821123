package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.{Frontier, ZOrder}

/** Physical-layout and dominance analytics: the Z-order clustering
  * key behind multi-dimensional data skipping, and the Pareto
  * frontier (skyline) operator.
  */
object LayoutQ {

  /** DuckDB rendering of [[ZOrder.spread16]] — the same shift/mask
    * ladder in plain integer SQL. */
  private def spreadSql(e: String): String = {
    val a = s"(($e) & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val c = s"(($b | ($b << 4)) & 252645135)"
    val d = s"(($c | ($c << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  private def mortonSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Z-order locality audit (q106): Morton-interleave two lineitem
    * key dimensions, bucket rows by the high 6 curve bits (64
    * contiguous key ranges), and measure each bucket's (x, y)
    * bounding box. Because fixing the top 3+3 interleaved bits pins
    * both coordinates to a 128-wide cell, every span comes back
    * ≤ 127 vs the 1023-wide global domain — the property that makes
    * a z-sorted file layout prunable on EITHER column from footer
    * min/max stats alone (a plain (x, y) sort gives y spans the full
    * domain). The write-time recipe is
    * `repartitionByRange(z).sortWithinPartitions(z)` → parquet
    * ([[ZOrder]] Scaladoc); this query verifies the curve arithmetic
    * and the locality bound cross-engine.
    *
    * Scale shape: the key is pure map-side bit arithmetic
    * (codegen'd); the audit is one groupBy on a 64-value key. */
  val q106 = Qry(
    "q106_zorder_layout",
    (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .select(
          (col("l_partkey").cast("long") % 1024).as("x"),
          (col("l_suppkey").cast("long") % 1024).as("y"))
        .withColumn("z",
          ZOrder.interleave16(col("x"), col("y")))
        .withColumn("zbucket", expr("z div 16384"))
        .groupBy(col("zbucket"))
        .agg(
          count(lit(1)).as("n"),
          (max(col("x")) - min(col("x"))).as("x_span"),
          (max(col("y")) - min(col("y"))).as("y_span"))
        .orderBy(col("zbucket"))
    },
    Some(s"""
      WITH pts AS (
        SELECT CAST(l_partkey AS BIGINT) % 1024 AS x,
               CAST(l_suppkey AS BIGINT) % 1024 AS y
        FROM lineitem),
      keyed AS (
        SELECT x, y, ${mortonSql("x", "y")} // 16384 AS zbucket
        FROM pts)
      SELECT zbucket, COUNT(*) AS n,
             MAX(x) - MIN(x) AS x_span,
             MAX(y) - MIN(y) AS y_span
      FROM keyed GROUP BY zbucket ORDER BY zbucket"""))

  /** Pareto frontier (q108): the parts no other part beats on both
    * price (lower) and size (higher) — [[Frontier.skyline]]'s
    * distributive two-phase plan (banded local frontiers, global
    * pass over the survivors only). The oracle computes the frontier
    * in one global pass; matching results proves the distributive
    * decomposition exact. */
  val q108 = Qry(
    "q108_skyline",
    (s: SparkSession, d: String) => {
      Frontier.skyline(
        Tables.part(s, d).select(
          col("p_retailprice").as("price"),
          col("p_size").cast("long").as("size")),
        "price", "size", "floor(price / 10.0)")
        .orderBy(col("price"))
    },
    Some("""
      WITH pp AS (
        SELECT p_retailprice AS price,
               CAST(MAX(p_size) AS BIGINT) AS size
        FROM part GROUP BY 1),
      f AS (
        SELECT price, size,
               MAX(size) OVER (ORDER BY price
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS pmax
        FROM pp)
      SELECT price, size FROM f
      WHERE pmax IS NULL OR size > pmax
      ORDER BY price"""))

  val all: Seq[Qry] = Seq(q106, q108)
}
