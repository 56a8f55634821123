package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Item-item co-occurrence similarity — the "customers who bought X
  * also bought Y" / related-documents kernel: count how often two
  * items share a basket, normalize by each item's own basket count
  * (cosine over the binary basket-membership vectors), and keep the
  * top-k neighbors per item.
  *
  * cos(i,j) = c_ij / √(c_i · c_j) where c_ij = #baskets containing
  * both and c_i = #baskets containing i. All counts are exact
  * integers; the single √ and ÷ are IEEE-correctly-rounded, so the
  * score is engine-deterministic without micro-unit algebra
  * ([[Q.r6]]-snapped only to keep the downstream ORDER BY tie-safe).
  *
  * Scale shape: the pair generation is a per-basket self-join —
  * O(k²) rows per basket of k DISTINCT items, never all-pairs
  * across baskets (the co-occurrence analog of the banded LSH
  * candidate rule). One groupBy(pair) shuffle counts c_ij; the item
  * frequency frame is ITEM-cardinality and broadcasts into the
  * normalize step; top-k is a per-item window over each item's
  * neighbor rows (bounded by the item's co-occurrence degree). At
  * 100 TB the refinement is the usual frequency cap: drop baskets
  * above a size ceiling (a crawler session touching 10⁵ items is
  * noise, and k² on it is a straggler) — expressed here as
  * `maxBasket`.
  */
object Cooccur {

  /** @param baskets   rows containing `basketCol` and `itemCol`
    *                  (duplicates fine — membership is distinct'd)
    * @param topK      neighbors kept per item
    * @param maxBasket baskets with more distinct items than this are
    *                  dropped whole (skew guard; 0 disables)
    * @return (item, neighbor, c_pair, c_item, c_nbr, cos, rank) —
    *         rank 1..topK per item by (cos desc, neighbor asc) */
  def itemSimilarity(baskets: DataFrame, basketCol: String,
      itemCol: String, topK: Int, maxBasket: Int = 0): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val m = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val mb = if (maxBasket <= 0) m else {
      val sizes = m.groupBy(col("bk"))
        .agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") <= maxBasket)
      m.join(sizes.select(col("bk")), Seq("bk"))
    }
    val freq = mb.groupBy(col("it")).agg(count(lit(1)).as("c_item"))
    val pairs = mb.as("x")
      .join(mb.as("y"), col("x.bk") === col("y.bk") &&
        col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("a"), col("y.it").as("b"))
      .agg(count(lit(1)).as("c_pair"))
    val directed = pairs
      .select(col("a").as("item"), col("b").as("neighbor"),
        col("c_pair"))
      .unionAll(pairs.select(col("b").as("item"),
        col("a").as("neighbor"), col("c_pair")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cos").desc, col("neighbor"))
    directed
      .join(broadcast(freq).withColumnRenamed("it", "item"), Seq("item"))
      .join(broadcast(freq.select(col("it").as("neighbor"),
        col("c_item").as("c_nbr"))), Seq("neighbor"))
      .select(col("item"), col("neighbor"), col("c_pair"),
        col("c_item"), col("c_nbr"),
        Q.r6(col("c_pair").cast("double") /
          sqrt((col("c_item") * col("c_nbr")).cast("double")))
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }
}
