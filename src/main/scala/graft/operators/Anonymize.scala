package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-anonymity generalization ladder (Sweeney): a record may be
  * published only inside an equivalence class of ≥ k records sharing
  * its quasi-identifier tuple. Records whose fine-grained (level-1)
  * class is too small are generalized to a coarser (level-2) tuple;
  * classes still under k after generalization are suppressed.
  * Complements the PII arc: q180 masks direct identifiers inside
  * text, q181 erases a subject's rows, this bounds re-identification
  * risk of what remains.
  *
  * Level-2 class sizes count ONLY the records that failed level 1 —
  * publishing a record at both granularities would let an attacker
  * intersect the two releases, defeating the k bound.
  *
  * Scale shape: two analytic COUNT windows (one per QI tuple), no
  * joins and no driver state — at 100 TB this is two key-partitioned
  * exchanges over the record stream, and the second can be avoided
  * entirely when level-2 keys are a prefix of the level-1 clustering.
  */
object Anonymize {

  /** Annotate each record with the level at which it is publishable:
    * 1 (fine QI class ≥ k), 2 (coarse class of the level-1 leftovers
    * ≥ k), or 9 (suppressed).
    *
    * @param l1 level-1 (fine) quasi-identifier columns
    * @param l2 level-2 (coarse) quasi-identifier columns
    */
  def generalizationLevels(records: DataFrame, l1: Seq[Column],
      l2: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w1 = Window.partitionBy(l1: _*)
    val w2 = Window.partitionBy(l2: _*)
    records
      .withColumn("anon_c1", count(lit(1)).over(w1))
      .withColumn("anon_c2",
        sum(when(col("anon_c1") < k, 1L).otherwise(0L)).over(w2))
      .withColumn("anon_level",
        when(col("anon_c1") >= k, lit(1))
          .when(col("anon_c2") >= k, lit(2))
          .otherwise(lit(9)))
      .drop("anon_c1", "anon_c2")
  }
}
