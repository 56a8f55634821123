package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cascading subject-erasure (right-to-be-forgotten) over a
  * referential star: given a set of subject keys to erase, compute
  * the purge for the subject table AND every fact that references
  * it — directly (orders carry the customer key) or transitively
  * (line items reference erased orders, not customers) — plus the
  * audit a privacy pipeline must retain: how many rows each table
  * purged, a deterministic checksum of the purged keys (provable
  * coverage without retaining the keys themselves), and how many
  * rows survive.
  *
  * Scale shape: the erased-subject relation is selectivity-bounded
  * (an erasure batch is a vanishing fraction of the subject table)
  * and rides BROADCAST semi/anti joins into each fact scan — one
  * pass per table, no fact-side shuffle. The transitive hop
  * materializes the erased ORDER keys first (itself broadcast-sized
  * under the same selectivity) so the grandchild purge is again one
  * broadcast semi-join, never a three-way join. At 100 TB each
  * purge leg is exactly the partition-local rewrite a
  * MERGE/DELETE-on-lake table executes.
  */
object Erasure {

  /** One audit row per table: (table, n_purged, purged_key_sum,
    * n_retained). `purged_key_sum` sums the table's OWN primary key
    * over purged rows — replayable by any engine, retains no
    * subject data.
    *
    * @param subjects subject table; `subjectKey` its key column
    * @param erased   subject keys to erase (one column, any name)
    * @param child    fact referencing subjects via `childFk`;
    *                 `childKey` its own key
    * @param grand    fact referencing child via `grandFk`;
    *                 `grandKey` its own key
    */
  def audit(subjects: DataFrame, subjectKey: String,
      erased: DataFrame,
      child: DataFrame, childFk: String, childKey: String,
      grand: DataFrame, grandFk: String, grandKey: String)
      : DataFrame = {
    val ek = broadcast(
      erased.select(col(erased.columns.head).as("__ek")).distinct())
    def leg(table: String, df: DataFrame, joinCol: String,
        keyCol: String): (DataFrame, DataFrame) = {
      val purged = df.join(ek, col(joinCol) === col("__ek"),
        "left_semi")
      val retained = df.join(ek, col(joinCol) === col("__ek"),
        "left_anti")
      (purged.agg(lit(table).as("table"),
        count(lit(1)).as("n_purged"),
        coalesce(sum(col(keyCol)), lit(0L)).as("purged_key_sum"))
        .crossJoin(broadcast(
          retained.agg(count(lit(1)).as("n_retained")))),
        purged)
    }
    val (subjAudit, _) = leg("subjects", subjects, subjectKey,
      subjectKey)
    val (childAudit, purgedChild) = leg("child", child, childFk,
      childKey)
    // transitive hop: the grandchild references the CHILD key, so
    // its erased-key set is the purged child's keys — bounded by the
    // same erasure selectivity, broadcast again
    val grandEk = broadcast(purgedChild
      .select(col(childKey).as("__gk")).distinct())
    val purgedGrand = grand.join(grandEk,
      col(grandFk) === col("__gk"), "left_semi")
    val retainedGrand = grand.join(grandEk,
      col(grandFk) === col("__gk"), "left_anti")
    val grandAudit = purgedGrand.agg(lit("grand").as("table"),
        count(lit(1)).as("n_purged"),
        coalesce(sum(col(grandKey)), lit(0L)).as("purged_key_sum"))
      .crossJoin(broadcast(
        retainedGrand.agg(count(lit(1)).as("n_retained"))))
    subjAudit.unionByName(childAudit).unionByName(grandAudit)
  }

  /** The surviving rows of one table under an erased-key set — the
    * rewrite leg of the purge (pair with [[audit]] for the
    * compliance record). One broadcast anti-join. */
  def retain(df: DataFrame, fkCol: String, erased: DataFrame)
      : DataFrame = {
    val ek = broadcast(
      erased.select(col(erased.columns.head).as("__ek")).distinct())
    df.join(ek, col(fkCol) === col("__ek"), "left_anti")
  }
}
