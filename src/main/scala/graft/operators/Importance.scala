package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed n-gram importance weighting for data selection — the
  * DSIR idea (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling"): score every raw document by how much
  * more likely its features are under a small TARGET distribution
  * (here: the in-domain subset of the corpus itself) than under the
  * RAW distribution, using hashed bigram counts as the feature
  * space. High-scoring documents look like the target domain and
  * get selected/up-sampled for training.
  *
  * Scoring variant: where the paper sums log-ratios, this engine
  * scores the count-weighted MEAN of nano-snapped probability
  * ratios — the same monotone "more target-like" intent, but every
  * per-bucket ratio is a single IEEE division of exact integer
  * products, snapped to integer nano-units before any aggregation
  * (the [[BigramLm]] determinism contract; libm `ln` is not
  * correctly rounded and would hash-diverge engines).
  *
  * Scale shape: the text is tokenized once into (doc, bucket, cnt) —
  * one partial-aggregable shuffle whose width is bounded by
  * docs × buckets, NOT by token count. The bucket table (≤ `buckets`
  * rows: raw count, target count, smoothed ratio) aggregates from
  * that relation and broadcasts back for the per-doc score — no
  * second pass over text, no driver collection, and the 100 TB cost
  * is exactly one wide shuffle plus a broadcast join.
  */
object Importance {

  /** Per-document importance scores from hashed-bigram likelihood
    * ratios.
    *
    * @param docs      corpus with `idCol`, `textCol`, and boolean
    *                  `targetCol` marking the in-domain subset
    * @param buckets   hashed feature-space size (≤ 256 uses one md5
    *                  byte; keep it a power of two)
    * @return (idCol, n_feats, imp_nano): n_feats = bigram
    *         occurrences in the doc; imp_nano = floor-mean of the
    *         nano-snapped per-bucket ratio, count-weighted —
    *         imp_nano/1e9 ≈ p_target/p_raw under the doc's features.
    *         Docs with < 2 tokens carry no features and are absent.
    */
  def hashedNgramWeights(docs: DataFrame, idCol: String,
      textCol: String, targetCol: String,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0 && buckets <= 256,
      "buckets must fit one md5 byte")
    // space-joined bigrams through the native ShingleNGrams kernel
    // (the interpreted HOF gram chain dominated this query's
    // profile, same as every shingle query before the kernel)
    val grams = docs.select(col(idCol), col(targetCol).as("tgt"),
      explode(call_function("shingles",
        TextOps.tokens(col(textCol)), lit(2), lit(false))).as("g"))
    val docB = grams
      .groupBy(col(idCol),
        (conv(substring(md5(col("g")), 1, 2), 16, 10).cast("int")
          % buckets).as("b"))
      .agg(count(lit(1)).as("c"), first(col("tgt")).as("tgt"))
    val bucketTab = docB.groupBy(col("b"))
      .agg(sum(col("c")).as("r_b"),
        sum(when(col("tgt"), col("c")).otherwise(0L)).as("t_b"))
    val totals = bucketTab.agg(sum(col("r_b")).as("rr"),
      sum(col("t_b")).as("tt"))
    // ratio operands in decimal: t_b·rr products of a web-scale
    // corpus (~1e10 · ~1e12) wrap a long silently in non-ANSI
    // Spark — the oracle multiplies in HUGEINT, so must we
    def dec(c: Column) = c.cast("decimal(38,0)")
    val rho = bucketTab.crossJoin(broadcast(totals))
      .select(col("b"),
        floor(
          (dec(col("t_b") + lit(1L)) *
            dec(col("rr") + lit(buckets.toLong))).cast("double") /
          (dec(col("r_b") + lit(1L)) *
            dec(col("tt") + lit(buckets.toLong))).cast("double") *
          lit(1e9) + lit(0.5))
          .cast("long").as("rho_nano"))
    docB.join(broadcast(rho), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_feats"),
        expr("sum(c * rho_nano) div sum(c)").as("imp_nano"))
  }
}
