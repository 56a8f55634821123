package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Intra-document repetition signals — the MassiveText/Gopher-style
  * repetition rules (Rae et al. 2021, §A1.1) a training-data pipeline
  * applies BEFORE any cross-document dedup: the share of the most
  * frequent unigram, the share of the most frequent bigram, and the
  * fraction of trigram occurrences that are duplicates. Documents
  * dominated by one phrase (boilerplate, keyword stuffing, broken
  * markup) score high on all three and are filtered as low-quality.
  *
  * Scale shape: the three gram streams are built MAP-SIDE from the
  * token array ([[TextOps.grams]] — no window shuffle for adjacency),
  * then stacked into one (doc, kind, gram) stream, so the whole
  * profile costs two partial-aggregable exchanges keyed by document:
  * the gram-count groupBy and the per-kind roll-up. N documents in,
  * N rows out, no cross-document communication at all — this runs
  * embarrassingly parallel at any corpus size.
  */
object Repetition {

  /** Per-document repetition profile over whitespace tokens.
    *
    * @return one row per document with ≥ 3 tokens:
    *         (idCol, n_toks, top1_share, top2_share, dup3_frac) where
    *         top1_share = occurrences of the most frequent unigram / n,
    *         top2_share = occurrences of the most frequent bigram / (n-1),
    *         dup3_frac  = trigram occurrences appearing ≥ 2× / (n-2).
    *         Each ratio is a single IEEE double division of exact
    *         counts — deterministic across engines. */
  def signals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val stream = docs
      .select(col(idCol), explode(array((1 to 3).map(n =>
        struct(lit(n).as("kind"), TextOps.grams(toks, n).as("grams"))): _*))
        .as("g"))
      .select(col(idCol), col("g.kind").as("kind"),
        explode(col("g.grams")).as("gram"))
    val counts = stream.groupBy(col(idCol), col("kind"), col("gram"))
      .agg(count(lit(1)).as("c"))
    val perKind = counts.groupBy(col(idCol), col("kind"))
      .agg(max(col("c")).as("top_c"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_c"),
        sum(col("c")).as("tot"))
    def kv(k: Int, c: String) = max(when(col("kind") === k, col(c)))
    perKind.groupBy(col(idCol))
      .agg(kv(1, "tot").as("n_toks"),
        kv(1, "top_c").as("t1"),
        kv(2, "top_c").as("t2"), kv(2, "tot").as("tot2"),
        kv(3, "dup_c").as("d3"), kv(3, "tot").as("tot3"))
      .filter(col("n_toks") >= 3)
      .select(col(idCol), col("n_toks"),
        (col("t1").cast("double") / col("n_toks").cast("double"))
          .as("top1_share"),
        (col("t2").cast("double") / col("tot2").cast("double"))
          .as("top2_share"),
        (col("d3").cast("double") / col("tot3").cast("double"))
          .as("dup3_frac"))
  }
}
