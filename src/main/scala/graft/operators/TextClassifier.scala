package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality classification — the CCNet/fastText-style
  * gate (Wenzek et al. 2020 "CCNet"; Joulin et al. 2017 "Bag of
  * Tricks"): a LINEAR classifier over hashed bigram features,
  * split into the two halves a production pipeline deploys
  * separately:
  *
  *  - [[nbLogOddsWeights]] — TRAINING: Naive-Bayes log-odds weights
  *    from a labeled subset. Real pipelines train offline (fastText
  *    on Wikipedia-vs-CommonCrawl); this trains the same functional
  *    form in-plan so the whole chain is oracle-verifiable.
  *  - [[scoreDocs]] — INFERENCE, the step that actually runs over
  *    100 TB: hash each doc's bigrams into `buckets` counts, one
  *    integer dot product against the BROADCAST weight table, keep
  *    iff the log-likelihood ratio is positive.
  *
  * All arithmetic is exact integer: ln is the ppm fixed point
  * [[Graph.withLnPpm]] (512-entry fdlibm mantissa table + integer
  * shift/div algebra — the q254 machinery), so Spark and a SQL
  * oracle embedding the same table literals compute identical
  * BIGINTs; c·w products widen to DECIMAL(38,0) before summing
  * (loud-NULL house rule) and floor back to BIGINT.
  *
  * Scale shape (inference): one map-side explode of bigrams into
  * (doc, bucket, count) — partial-aggregable, width bounded by
  * docs × buckets, not tokens — then ONE broadcast join against the
  * ≤`buckets`-row weight table and a per-doc aggregate riding the
  * same shuffle. Training is the same count relation aggregated to
  * the bucket table (≤`buckets` rows) plus a 1-row total — no
  * second pass over text, no driver loops. At 100 TB the weight
  * table is a published artifact; inference cost is exactly one
  * wide shuffle.
  */
object TextClassifier {

  /** Hashed-bigram counts: (idCol, b, c) — one row per (doc, bucket)
    * with the doc's bigram occurrences hashed into `buckets` buckets
    * by the first md5 byte (the q166 feature space: shared hashing
    * means a weight table trained here scores q166-selected corpora
    * directly). Docs with < 2 tokens carry no features and are
    * absent. */
  def hashedBigramCounts(docs: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0 && buckets <= 256,
      "buckets must fit one md5 byte")
    docs.select(col(idCol),
        explode(call_function("shingles",
          TextOps.tokens(col(textCol)), lit(2), lit(false))).as("g"))
      .groupBy(col(idCol),
        (conv(substring(md5(col("g")), 1, 2), 16, 10).cast("int")
          % buckets).as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Naive-Bayes log-odds weight table from a labeled corpus:
    * (b, w_ppm) with
    * `w_ppm(b) = [lnPpm(p_b+1) − lnPpm(P+B)] − [lnPpm(n_b+1) −
    * lnPpm(N+B)]` — add-one-smoothed log of how much likelier
    * bucket b is under the positive (target) class than the
    * negative. A doc's summed c·w is then its Naive-Bayes
    * log-likelihood ratio, the linear-classifier form fastText
    * reduces to for fixed features.
    *
    * @param docs labeled corpus; `labelCol` boolean (true = target
    *             class). Rows with NULL labels are excluded — an
    *             unlabeled doc is not evidence for either class.
    * @return (b, w_ppm) — at most `buckets` rows; buckets unseen in
    *         training are absent (inference treats them as weight
    *         0 exactly as smoothing-free absence implies no
    *         evidence; the SQL oracle mirrors the absence). */
  def nbLogOddsWeights(docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, buckets: Int): DataFrame = {
    val labeled = docs.filter(col(labelCol).isNotNull)
    val counts = hashedBigramCounts(labeled, idCol, textCol, buckets)
      .join(docs.select(col(idCol), col(labelCol).as("__y")),
        Seq(idCol))
    val perBucket = counts.groupBy(col("b"))
      .agg(sum(when(col("__y"), col("c")).otherwise(0L)).as("p_b"),
        sum(when(!col("__y"), col("c")).otherwise(0L)).as("n_b"))
    val totals = perBucket
      .agg((sum(col("p_b")) + lit(buckets.toLong)).as("pt"),
        (sum(col("n_b")) + lit(buckets.toLong)).as("nt"))
    val withTot = perBucket.crossJoin(broadcast(totals))
      .select(col("b"), (col("p_b") + 1L).as("p1"),
        (col("n_b") + 1L).as("n1"), col("pt"), col("nt"))
    val ln = Seq("p1", "n1", "pt", "nt").foldLeft(withTot) {
      case (df, c) => Graph.withLnPpm(df, c, s"ln_$c")
    }
    ln.select(col("b"),
      (col("ln_p1") - col("ln_pt") - col("ln_n1") + col("ln_nt"))
        .as("w_ppm"))
  }

  /** Collect a trained (b, w_ppm) weight table to a driver map —
    * the publish step between offline training and the per-row
    * inference form [[llrExpr]]. Bounded by construction (≤ 256
    * buckets fit one md5 byte), and guarded anyway so a mistakenly
    * passed document table can never driver-collect a corpus. */
  def collectWeights(weights: DataFrame): Map[Int, Long] = {
    val rows = weights
      .select(col("b").cast("int"), col("w_ppm").cast("long"))
      .limit(257).collect()
    require(rows.length <= 256,
      "weight table exceeds 256 rows — not a hashed-bigram weight table")
    rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  /** AGGREGATION-FREE inference — the same log-likelihood ratio as
    * [[scoreDocs]] computed as one per-row expression:
    * Σ_b c_b·w(b) over a doc's bucket counts is identically
    * Σ_g w(bucket(g)) over its bigram OCCURRENCES, so the dot
    * product folds over the shingle array with a higher-order
    * `aggregate` and a ≤256-entry map literal — no explode, no
    * groupBy, no join. That makes it legal where [[scoreDocs]]'s
    * shuffle shape is not: inside a streaming query that already
    * carries its own stateful aggregation (Spark allows one), i.e.
    * the CCNet deployment shape — train offline, gate every
    * micro-batch at ingest ([[graft.streaming.StreamOps
    * .corpusIngest]]).
    *
    * Exactness: each term is one BIGINT weight; a doc would need
    * ~3×10^10 bigrams to overflow the long accumulator, which is
    * three orders of magnitude past any single document, so the
    * floor/DECIMAL widening [[scoreDocs]] applies to its c·w
    * products is a no-op here and the two forms are bit-equal
    * (`TextClassifierSpec` pins it). Docs with < 2 tokens have no
    * features and fold to 0 — gate on `num_feats >= 1` to mirror
    * scoreDocs' absence-of-verdict for them. */
  def llrExpr(text: Column, weightMap: Map[Int, Long],
      buckets: Int): Column = {
    require(buckets > 0 && buckets <= 256,
      "buckets must fit one md5 byte")
    val grams = call_function("shingles",
      TextOps.tokens(text), lit(2), lit(false))
    val wmap = typedLit(weightMap)
    aggregate(grams, lit(0L), (acc, g) =>
      acc + coalesce(
        element_at(wmap,
          conv(substring(md5(g), 1, 2), 16, 10).cast("int")
            % buckets),
        lit(0L)))
  }

  /** Bigram-occurrence count as a per-row expression — [[llrExpr]]'s
    * companion for the `n_feats >= 1` has-evidence gate. */
  def numFeatsExpr(text: Column): Column =
    size(call_function("shingles",
      TextOps.tokens(text), lit(2), lit(false))).cast("long")

  /** Inference: score every doc against a weight table.
    * @param weights (b, w_ppm) — broadcast (≤ `buckets` rows)
    * @return (idCol, n_feats, llr_ppm, keep): n_feats = bigram
    *         occurrences; llr_ppm = Σ_b c_b·w_ppm(b) (the
    *         log-likelihood ratio at ppm scale, DECIMAL-widened
    *         products); keep = llr_ppm > 0 (more target-like than
    *         not — CCNet's keep/head-bucket decision). Docs with no
    *         features are absent (no evidence, no verdict). */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int): DataFrame =
    hashedBigramCounts(docs, idCol, textCol, buckets)
      .join(broadcast(weights), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_feats"),
        expr("CAST(floor(sum(CAST(c AS DECIMAL(38,0)) * " +
          "coalesce(w_ppm, 0L))) AS BIGINT)").as("llr_ppm"))
      .withColumn("keep", col("llr_ppm") > 0L)
}
