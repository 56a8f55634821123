package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 — the MOSS algorithm): slide a window of `w` consecutive
  * character-k-gram hashes over each document and keep the minimum
  * hash per window (rightmost on ties — standard winnowing; the
  * paper's "robust" variant instead prefers re-selecting the
  * previous window's fingerprint on ties, trading a strictly local
  * rule for fewer fingerprints — not what is implemented here), which
  * guarantees any shared substring of length ≥ k + w − 1 contributes
  * at least one COMMON fingerprint to both documents while storing
  * only ~2/(w+1) of all gram hashes. The selected (position, hash)
  * set is the document's fingerprint; equal hashes across documents
  * nominate plagiarism/near-copy candidates by equi-join — never an
  * all-pairs comparison.
  *
  * Determinism: the gram hash is the first 6 hex digits of
  * md5(substring) (24 bits), and the rightmost-min-of-window
  * selection is ONE MIN window over the packed key
  * `hash · 2²⁰ − position` (min hash wins; among equal hashes the
  * LARGER position gives the SMALLER key — the standard-winnowing
  * rightmost-min tie rule), decoded algebraically with integer div/mod —
  * the same ops any SQL engine replays exactly. Positions are
  * 1-based to match SQL `substring`.
  *
  * Scale shape: gram expansion + hashing + the per-document window
  * are all partitioned by doc_id (one shuffle for the window when
  * the scan isn't already doc-partitioned); fingerprint joins are
  * hash equi-joins. Contract: documents shorter than 2²⁰ characters
  * (the position pack width) — shard longer docs first.
  */
object Winnow {

  /** Position pack width: doc offset lives in [1, 2²⁰). */
  val PosPack: Long = 1L << 20

  /** Per-document winnowing fingerprints with positions:
    * (idCol, pos, fp) — 1-based gram position and 24-bit hash of
    * each selected fingerprint, distinct per document.
    *
    * @param k gram length in characters
    * @param w window: one fingerprint kept per w consecutive grams
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1: k=$k w=$w")
    val grams = docs
      .select(col(idCol), col(textCol).as("t"))
      // guard: Spark sequence(1, n) with n < 1 generates a DESCENDING
      // sequence, not an empty one — docs shorter than k get no grams
      .select(col(idCol),
        explode(when(length(col("t")) >= k,
          sequence(lit(1), length(col("t")) - lit(k - 1)))
          .otherwise(array())).as("pos"),
        col("t"))
      .select(col(idCol), col("pos"),
        conv(substring(md5(expr(s"substring(t, pos, $k)")), 1, 6),
          16, 10).cast("long").as("h"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    grams
      .withColumn("mkey",
        min(col("h") * lit(PosPack) - col("pos")).over(win))
      // full windows only: the first w-1 positions see short frames
      .filter(col("pos") >= w)
      .select(col(idCol), col("mkey")).distinct()
      .select(col(idCol),
        expr(s"(mkey + ${PosPack - 1}) div $PosPack").as("fp"),
        col("mkey"))
      .select(col(idCol), (col("fp") * lit(PosPack) - col("mkey"))
        .as("pos"), col("fp"))
  }

  /** Document-pair overlap: count of DISTINCT shared fingerprint
    * hashes between every qualifying pair (d1 < d2). The join is an
    * equi-join on the fingerprint hash — candidate pairs only ever
    * materialize where a fingerprint is genuinely shared. */
  def overlapPairs(fps: DataFrame, idCol: String,
      minShared: Int): DataFrame = {
    val a = fps.select(col(idCol).as("d1"), col("fp"))
    val b = fps.select(col(idCol).as("d2"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(countDistinct(col("fp")).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
