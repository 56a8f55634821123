package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-neighborhood embedding generator — the fixture that makes
  * ANN recall MEASURABLE. The driver's synthetic `embeddings` table
  * is near-random, so recall@10 of any indexed ranking lands in the
  * 0.26-0.36 band regardless of codebook quality: a real quantization
  * regression is invisible against it. This generator plants ground
  * truth instead: `nClusters` well-separated centroids (centroid c
  * sits at distance `spread` along axis c % dim, scaled by
  * 1 + c / dim so clusters sharing an axis stay `spread` apart), and
  * each member is its centroid plus bounded integer noise in
  * [-2, 2]. Within-cluster distance² is at most 16·dim while
  * inter-cluster distance² is at least `spread`², so for
  * `spread` ≫ 4·√dim the true top-(perCluster-1) neighbors of every
  * vector are exactly its cluster mates — an ANN index with a decent
  * quantizer must recover them, and one with a sabotaged quantizer
  * cannot, which is the property the recall assertions in
  * `AnnRecallSpec` pin.
  *
  * Everything is integer-valued and exactly representable in Float,
  * so distances are float-exact and rankings deterministic.
  *
  * Layout contract (matches [[Pq.codebook]]'s seed precondition):
  * vec_id is dense over [0, nClusters·perCluster) with
  * label = vec_id % nClusters — ids 0..k-1 are one member from each
  * of the first k clusters, so seeding a codebook from the id prefix
  * covers the planted structure.
  *
  * Scale shape: one `spark.range` plus pure column expressions — no
  * driver-side data, no shuffle; generates any size distributed.
  */
object Planted {

  def vectors(spark: SparkSession, nClusters: Int, perCluster: Int,
      dim: Int, spread: Double = 100.0): DataFrame = {
    require(nClusters >= 1 && perCluster >= 1 && dim >= 1)
    val n = nClusters.toLong * perCluster
    val label = (col("vec_id") % nClusters).cast("int")
    val axis = label % dim
    val scale = lit(spread) * (lit(1) + (label / lit(dim)).cast("int"))
    val emb = array((0 until dim).map { t =>
      val cent = when(axis === t, scale).otherwise(lit(0.0))
      val noise = ((col("vec_id") * lit(73856093L) +
        lit(t.toLong * 19349663L)) % 5 - lit(2)).cast("double")
      (cent + noise).cast("float")
    }: _*)
    spark.range(n).select(
      col("id").as("vec_id"),
      label.as("label"),
      emb.as("embedding"))
  }
}
