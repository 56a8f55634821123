package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Intra-document repetition signals — the MassiveText/Gopher-style
  * repetition rules (Rae et al. 2021, §A1.1) a training-data pipeline
  * applies BEFORE any cross-document dedup: the share of the most
  * frequent unigram, the share of the most frequent bigram, and the
  * fraction of trigram occurrences that are duplicates. Documents
  * dominated by one phrase (boilerplate, keyword stuffing, broken
  * markup) score high on all three and are filtered as low-quality.
  *
  * Scale shape — ZERO shuffles: every metric is per-document, so
  * nothing ever needs to leave the row. Each gram stream is built
  * map-side from the token array ([[TextOps.grams]]), sorted
  * in-place, and reduced by a single run-length fold (equal grams
  * are adjacent after the sort, so max-run = top-gram count and the
  * duplicate mass is the sum of runs ≥ 2). The first cut of this
  * operator counted (doc, kind, gram) through two groupBy exchanges —
  * partial-aggregable but still a corpus-sized shuffle whose hash
  * state spilled at 1000× data (1788 s at sf100, ~2.6× over linear
  * from sf10); the fold form does the same arithmetic inside the
  * projection and scales embarrassingly parallel.
  */
object Repetition {

  /** Run-length statistics of a gram array via one sorted fold:
    * @return struct(mx = longest run = top-gram occurrence count,
    *         dup = Σ length of runs ≥ 2 = duplicated occurrences).
    *
    * Kept as a single `aggregate` fold deliberately (r16): an
    * attempted rewrite to filter/zip_with array primitives measured
    * 300× SLOWER — a lambda that references a derived array (e.g.
    * `element_at(sort_array(g), i)`) re-evaluates that whole subtree
    * PER ELEMENT in interpreted HOF evaluation, turning the pass
    * quadratic. The fold walks the sorted array once with one
    * accumulator; the interpreted per-element cost is real but
    * linear, and the operator's scale lever is scan parallelism
    * ([[signals]] fans the corpus out), not this expression. */
  private def runStats(grams: Column): Column = {
    def closeMx(acc: Column) =
      greatest(acc.getField("mx"), acc.getField("run"))
    def closeDup(acc: Column) =
      acc.getField("dup") + when(acc.getField("run") >= 2L,
        acc.getField("run")).otherwise(0L)
    aggregate(
      sort_array(grams),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("mx"), lit(0L).as("dup")),
      (acc, x) => {
        val same = acc.getField("prev").isNotNull &&
          x === acc.getField("prev")
        struct(
          x.as("prev"),
          when(same, acc.getField("run") + 1L).otherwise(lit(1L))
            .as("run"),
          when(same, acc.getField("mx")).otherwise(closeMx(acc))
            .as("mx"),
          when(same, acc.getField("dup")).otherwise(closeDup(acc))
            .as("dup"))
      },
      acc => struct(closeMx(acc).as("mx"), closeDup(acc).as("dup")))
  }

  /** Per-document repetition profile over whitespace tokens.
    *
    * @return one row per document with ≥ 3 tokens:
    *         (idCol, n_toks, top1_share, top2_share, dup3_frac) where
    *         top1_share = occurrences of the most frequent unigram / n,
    *         top2_share = occurrences of the most frequent bigram / (n-1),
    *         dup3_frac  = trigram occurrences appearing ≥ 2× / (n-2).
    *         Each ratio is a single IEEE double division of exact
    *         counts — deterministic across engines. */
  def signals(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // Deliberately NOT fanned out (r16, measured): the fold is
    // ALLOCATION-bound (one interpreted struct per gram), so fanning
    // the 43 MB sf10 corpus from its ~4 packed scan tasks to 32
    // in-JVM tasks measured 9.0 → 13-19 s — 32 concurrent
    // interpreted folds thrash the shared heap faster than they
    // compute. On a real cluster the same width lands on separate
    // executor heaps, where the scan's own split width already
    // provides it.
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("n_toks"),
        runStats(TextOps.grams(col("__toks"), 1)).as("s1"),
        runStats(TextOps.grams(col("__toks"), 2)).as("s2"),
        runStats(TextOps.grams(col("__toks"), 3)).as("s3"))
      .filter(col("n_toks") >= 3L)
      .select(col(idCol), col("n_toks"),
        (col("s1.mx").cast("double") / col("n_toks").cast("double"))
          .as("top1_share"),
        (col("s2.mx").cast("double")
          / (col("n_toks") - 1L).cast("double")).as("top2_share"),
        (col("s3.dup").cast("double")
          / (col("n_toks") - 2L).cast("double")).as("dup3_frac"))
}
