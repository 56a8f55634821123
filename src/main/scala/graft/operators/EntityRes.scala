package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution (record linkage): cluster records
  * whose name strings are within a small edit distance, without ever
  * comparing all pairs.
  *
  * Three-stage shape, each stage chosen for the 100 TB case:
  *  1. EXACT collapse — records group to DISTINCT name strings first
  *     (one partial-aggregable shuffle). All fuzzy work then runs on
  *     the name vocabulary, which is orders of magnitude smaller
  *     than the record stream (Zipfian names collapse hard).
  *  2. BLOCKED pairing — names self-join on a cheap blocking key (a
  *     short prefix here; phonetic keys or q-gram buckets slot in the
  *     same way). The quadratic comparison is confined to each block;
  *     `levenshtein` (codegen'd built-in) runs only inside blocks,
  *     and the classic blocking recall tradeoff (true matches that
  *     disagree on the block key are never compared) is explicit.
  *  3. TRANSITIVE closure — matched name pairs form a graph; the
  *     shared [[Components]] kernel labels each name with its min
  *     reachable name id, so chains A≈B≈C resolve to one entity even
  *     when A and C exceed the distance threshold.
  */
object EntityRes {

  /** Resolve records to entities by fuzzy name identity.
    *
    * @param records one row per record: `idCol` (unique long) +
    *                `nameCol`
    * @param blockPrefix blocking-key length (name prefix, exact)
    * @param maxDist  max Levenshtein distance to match within block
    * @return one row per distinct name: name, name_id (min record id
    *         bearing it), n_recs, entity_id (min name_id in cluster)
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
      blockPrefix: Int, maxDist: Int): DataFrame = {
    val names = records
      .groupBy(col(nameCol).as("name"))
      .agg(min(col(idCol)).as("name_id"), count(lit(1)).as("n_recs"))
    val blocked = names
      .withColumn("blk", substring(col("name"), 1, blockPrefix))
    val edges = blocked.select(col("blk"), col("name_id").as("a"),
        col("name").as("na"))
      .join(blocked.select(col("blk"), col("name_id").as("b"),
        col("name").as("nb")), Seq("blk"))
      .filter(col("a") < col("b") &&
        levenshtein(col("na"), col("nb")) <= maxDist)
      .select(col("a"), col("b"))
    val comp = Components.connectedComponents(
      names.select(col("name_id")), "name_id", edges, "a", "b")
    names.join(comp, names("name_id") === comp("id"))
      .select(col("name"), col("name_id"), col("n_recs"),
        col("component").as("entity_id"))
  }
}
