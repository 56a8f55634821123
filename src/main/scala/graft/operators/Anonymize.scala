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

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) for an
    * ORDERED sensitive attribute — the skewness-attack fix over
    * l-diversity: a class can be l-diverse yet still leak (all its
    * values in the top decile of a salary scale). A QI class
    * satisfies t-closeness iff the Earth Mover's Distance between
    * its sensitive-value distribution and the GLOBAL distribution is
    * ≤ t; for an ordered domain of m values the EMD is the mean of
    * the m−1 absolute cumulative differences
    * (1/(m−1))·Σᵢ|Σ_{j≤i}(p_j − q_j)|.
    *
    * Exact integer algebra (the q193/q200 lesson — no float ever
    * reaches a hashed column): with class size n, global size N,
    * per-value counts c_v (class) and g_v (global), the cumulative
    * difference scaled by n·N is Cᵢ = Σ_{j≤i}(c_j·N − g_j·n), an
    * integer; EMD·(m−1)·n·N = Σ|Cᵢ|. The audit compares
    * emd_num·tDen ≤ emd_den·tNum with emd_den = (m−1)·n·N — exact
    * for any rational threshold t = tNum/tDen. Overflow bound:
    * |Cᵢ| ≤ n·N and emd_num ≤ m·n·N, so longs hold while
    * m·n·N·tDen < 2⁶³ — at a billion rows with m ≤ 100 sensitive
    * buckets and tDen ≤ 100 that is n ≤ 9×10⁸, far past any
    * publishable class; beyond it, audit per-shard histograms.
    *
    * Scale shape: two partial-agg exchanges (per-(class,value) and
    * per-class counts), the global histogram and the 1-row (N, m)
    * totals are broadcast (bounded by the sensitive DOMAIN, not the
    * data), the per-class×domain frame is classes×m rows with one
    * class-keyed cumulative window. Nothing driver-sized.
    *
    * @param qi   quasi-identifier column NAMES (pre-projected)
    * @param s    ordered sensitive column name (orderable, non-null)
    * @return one row per QI class: qi…, anon_n, anon_m (global
    *         domain size), anon_big_n (global rows), emd_num,
    *         emd_den, anon_ok */
  def tClosenessOrdered(records: DataFrame, qi: Seq[String], s: String,
      tNum: Long, tDen: Long): DataFrame = {
    require(tNum >= 0 && tDen > 0, s"bad threshold: $tNum/$tDen")
    val r = records.select((qi :+ s).map(col): _*)
    val glob = r.groupBy(col(s)).agg(count(lit(1)).as("g_cnt"))
    val tot = glob.agg(sum(col("g_cnt")).as("anon_big_n"),
      count(lit(1)).as("anon_m"))
    val cls = r.groupBy(qi.map(col): _*).agg(count(lit(1)).as("anon_n"))
    val cv = r.groupBy((qi :+ s).map(col): _*)
      .agg(count(lit(1)).as("c_cnt"))
    val w = Window.partitionBy(qi.map(col): _*).orderBy(col(s))
    cls.crossJoin(broadcast(glob)).crossJoin(broadcast(tot))
      .join(cv, qi :+ s, "left")
      .withColumn("c_cnt", coalesce(col("c_cnt"), lit(0L)))
      .withColumn("cum", sum(col("c_cnt") * col("anon_big_n") -
        col("g_cnt") * col("anon_n")).over(w))
      .groupBy((qi ++ Seq("anon_n", "anon_m", "anon_big_n"))
        .map(col): _*)
      .agg(sum(abs(col("cum"))).as("emd_num"))
      .withColumn("emd_den",
        (col("anon_m") - 1) * col("anon_n") * col("anon_big_n"))
      .withColumn("anon_ok",
        col("emd_num") * tDen <= col("emd_den") * tNum)
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
