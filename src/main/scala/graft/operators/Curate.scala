package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation (the composed LLM-training-data
  * pipeline the build brief asks for): normalize → quality filter →
  * exact dedup → near-dup removal, all from the verified operator
  * library. One call takes a raw document table to a training-ready
  * corpus.
  *
  * Scale shape: normalization/quality are shuffle-free map work;
  * exact dedup shuffles once on the content hash; near-dup is the
  * LSH path (band shuffle on ids only). Nothing quadratic, nothing
  * driver-side.
  *
  * Near-dup policy (two selectable):
  *  - greedy keep-earliest (default): any doc appearing as the LATER
  *    member (`b`) of a confirmed near-dup pair (a < b) is dropped.
  *    Deterministic and single-pass.
  *  - transitive (`transitive = true`): [[Components]] closes the
  *    pair graph and exactly one doc (the min id) survives per
  *    near-dup CLUSTER — chains A≈B≈C with A≉C collapse to A, where
  *    greedy would also drop C only via the B pair it shares.
  */
object Curate {

  /** Whitespace/digit/case normalization (the q56 cleaning pass). */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[0-9]+", ""), "\\s+", " "))

  /** @param docs         (idCol, textCol) document table
    * @param stopwords    quality-scoring stop list
    * @param minQuality   drop docs scoring below this
    * @param n            shingle size for near-dup
    * @param k            minhash signature length
    * @param bands        LSH bands (k % bands == 0)
    * @param minJaccard   near-dup confirmation threshold
    * @param transitive   near-dup policy: false = greedy pairwise
    *                     keep-earliest, true = connected-components
    *                     clustering (one survivor per cluster)
    * @return surviving docs: (id, clean, quality)
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = Seq("the", "a"),
      minQuality: Double = 0.5, n: Int = 3, k: Int = 6,
      bands: Int = 3, minJaccard: Double = 0.9,
      transitive: Boolean = false): DataFrame = {
    val cleaned = docs.select(col(idCol).as("id"),
        normalize(col(textCol)).as("clean"))
      .withColumn("quality", TextOps.qualityScore(col("clean"),
        stopwords))
      .filter(col("quality") >= minQuality)
    // exact dedup: keep the smallest id per identical clean text.
    // The frame feeds THREE consumers (band keys, shingle join-back,
    // final anti-join); a lazy .persist() lets parallel stages of the
    // single downstream action race to populate the cache and
    // re-evaluate the scan+window per consumer. Eager localCheckpoint
    // materializes it exactly once, truncates the lineage (the
    // downstream plan reads blocks, never the scan), and is reclaimed
    // by the ContextCleaner when unreferenced — no unpersist
    // obligation on the caller. At cluster scale prefer a reliable
    // checkpoint dir (localCheckpoint blocks are executor-local and
    // non-replicated, so an executor loss kills the job).
    val exact = cleaned
      .withColumn("__h", md5(col("clean")))
      .withColumn("__keep", min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))))
      .filter(col("id") === col("__keep"))
      .drop("__h", "__keep")
      .localCheckpoint(true)
    val pairs = Dedup.lshNearDupPairs(exact, "id", "clean",
      n = n, k = k, bands = bands, minJaccard = minJaccard)
    val dropIds =
      if (transitive)
        // one survivor (the min id = the component label) per cluster
        Components.connectedComponents(exact, "id", pairs, "a", "b")
          .filter(col("id") =!= col("component"))
          .select(col("id"))
      else
        // greedy: drop the later member of every confirmed pair
        pairs.select(col("b").as("id")).distinct()
    exact.join(dropIds, Seq("id"), "left_anti")
  }
}
