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

  /** l-diversity annotation (Machanavajjhala et al.): k-anonymity
    * alone fails when every record of a ≥k class shares one sensitive
    * value (the homogeneity attack — class size tells the attacker
    * the secret anyway). A class is publishable iff it has ≥ k
    * records AND ≥ l DISTINCT sensitive values. Emits per record the
    * class size (`anon_n`), the distinct-sensitive count
    * (`anon_div`), and `anon_ok`.
    *
    * Scale shape: one QI-partitioned window carrying both the COUNT
    * and a `collect_set` of the sensitive column — the set is bounded
    * by the sensitive DOMAIN (segments, priorities: tens of values),
    * never by class size, so the window state stays O(|domain|) per
    * class at 100 TB. A billion-value sensitive domain would instead
    * use the groupBy-then-broadcast-join form of the same stats. */
  def lDiversity(records: DataFrame, qi: Seq[Column],
      sensitive: Column, k: Int, l: Int): DataFrame = {
    require(k >= 1 && l >= 1, s"k and l must be >= 1: $k, $l")
    val w = Window.partitionBy(qi: _*)
    records
      .withColumn("anon_n", count(lit(1)).over(w))
      .withColumn("anon_div",
        size(collect_set(sensitive).over(w)).cast("long"))
      .withColumn("anon_ok",
        col("anon_n") >= k && col("anon_div") >= l)
  }

  /** Warner randomized-response report bit: the respondent reports
    * the TRUE bit with probability 3/4 and the flipped bit with
    * probability 1/4. The coin is derandomized for reproducibility —
    * bits 30-31 of md5(`key`) decide the flip (a production privacy
    * deployment draws a real client-side coin; every downstream
    * identity here is coin-agnostic). The aggregate debias is pure
    * integer algebra: with flip rate q = 1/4,
    * E[reported] = truth·(1−q) + (n−truth)·q, so
    * 2·truth ≈ est2 = 4·reported − n — per-record noise, exact
    * integer recovery in expectation, no raw bit ever leaves the
    * mapper. */
  def rrReported(truth: Column, key: Column): Column = {
    val flip = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % 4 === 0
    when(flip, lit(1) - truth.cast("int")).otherwise(truth.cast("int"))
  }
}
