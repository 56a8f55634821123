package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence graph construction: items sharing a group (parts
  * sharing an order, terms sharing a document) become edges.
  *
  * The naive build is `distinct(group, item)` self-joined on the
  * group key — three exchanges before the first edge exists (the
  * distinct hash-partitions on (group, item), so BOTH join inputs
  * re-exchange on group). This operator instead aggregates each
  * group's item SET (one shuffle, map-side partial collect_set —
  * which also absorbs the (group, item) dedup for free) and expands
  * the pairs map-side from the set: one exchange total, measured
  * ~1.9× faster on the sf0.1 co-purchase graph.
  *
  * Contract: group cardinality must be BOUNDED (basket-sized) — the
  * expansion materializes |set|² rows per group in one task. That
  * holds by construction for market-basket groups (an order has a
  * bounded line count at any corpus scale). For unbounded groups
  * (all docs sharing a token) keep the self-join form, which
  * distributes each group's quadratic expansion across the join.
  */
object Graph {

  /** Ordered co-occurrence pairs (src < dst), ONE ROW PER GROUP
    * containing the pair — feed a groupBy(src, dst).count() for
    * co-occurrence weights, or `.distinct()` for the edge set. */
  def coOccurrencePairs(df: DataFrame, groupCol: String,
      itemCol: String): DataFrame =
    itemSets(df, groupCol, itemCol)
      .select(explode(col("ps")).as("src"), col("ps"))
      .select(col("src"), explode(col("ps")).as("dst"))
      .filter(col("src") < col("dst"))

  /** Symmetric co-occurrence pairs (both directions, src ≠ dst) —
    * the undirected-graph expansion [[PageRank.integerRanks]]
    * expects. One row per (group, direction). */
  def coOccurrenceEdges(df: DataFrame, groupCol: String,
      itemCol: String): DataFrame =
    itemSets(df, groupCol, itemCol)
      .select(explode(col("ps")).as("src"), col("ps"))
      .select(col("src"), explode(col("ps")).as("dst"))
      .filter(col("src") =!= col("dst"))

  private def itemSets(df: DataFrame, groupCol: String,
      itemCol: String): DataFrame =
    df.select(col(groupCol).as("g"), col(itemCol).as("i"))
      .groupBy(col("g"))
      .agg(collect_set(col("i")).as("ps"))
      .filter(size(col("ps")) > 1)
}
