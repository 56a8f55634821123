package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional inverted index + phrase query — the IR-engine building
  * block next to BM25 (queries/Text.scala q95): a postings RELATION
  * (term, doc, position) rather than a collected per-term list, which
  * is exactly the form that scales — per-term posting arrays grow
  * unboundedly with the corpus, while the relation form stays a plain
  * columnar table that sorts/buckets by term and joins by document.
  * Phrase matching is the classic positional-intersection: a phrase
  * "w1 w2" matches wherever the posting of w1 at position p meets the
  * posting of w2 at p+1 — an equi-join on (doc, adjacent position),
  * never a rescan of the text.
  *
  * Scale shape: the index build is one map-side posexplode (no
  * shuffle at all until a consumer keys by term); the phrase
  * intersection shuffles only the two terms' postings (term-pruned —
  * predicate pushdown on term when the index is stored term-bucketed
  * parquet), and the per-document hit roll-up is partial-aggregable.
  */
object Postings {

  /** Positional postings: one row per token occurrence.
    * @return (idCol, pos, tok) with pos 1-based */
  def positional(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    // fanOut before the tokenize+posexplode (r15): a single-row-group
    // corpus scans as one task and serializes the tokenization;
    // identity at scale where the scan is already wide
    graft.Tables.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("p0", "tok")))
      .select(col(idCol), (col("p0") + 1).cast("long").as("pos"),
        col("tok"))

  /** All occurrences of the two-token phrase (w1Col, w2Col) — passed
    * as a ONE-ROW DataFrame so data-derived phrases stay inside the
    * plan (broadcast, no driver round-trip).
    *
    * MATERIALIZATION CONTRACT (r16, ADVICE): the two-term match set
    * is eagerly checkpointed below. Its size is the two terms'
    * combined posting lists — for stop-word-frequency terms on a
    * huge corpus that is a corpus-fraction-sized frame pinned to
    * executor memory/disk, so at scale feed this method a
    * TERM-PRUNED postings relation ([[prunedForPhrase]] over a
    * term-bucketed layout), where the match set is exactly the
    * pruned input. The checkpoint is what keeps the two positional
    * legs below from re-running the corpus tokenization twice (the
    * r15 win: q138 3.2-4.0 → ~1 s).
    * @return (idCol, pos) of each phrase start */
  def phraseHits(postings: DataFrame, idCol: String,
      phrase: DataFrame, w1Col: String, w2Col: String): DataFrame = {
    // ONE pass over the postings relation (r15): the old two-leg
    // form joined `postings` against the phrase twice, planting the
    // postings subtree — typically an unmaterialized tokenize+
    // posexplode of the whole corpus — twice in the physical plan
    // and executing it twice. Filter both terms in a single
    // broadcast join, materialize the (tiny, two-term) match set,
    // and derive each leg as a filter of it: identical rows (the
    // phrase frame is one row, so the disjunctive join emits each
    // matching posting exactly once).
    val f = postings.join(broadcast(phrase),
        postings("tok") === phrase(w1Col) ||
          postings("tok") === phrase(w2Col))
      .select(col(idCol), col("pos"), col("tok"),
        col(w1Col).as("__w1"), col(w2Col).as("__w2"))
      .transform(graft.operators.Ckpt.cut)
    val p1 = f.filter(col("tok") === col("__w1"))
      .select(col(idCol), col("pos"))
    // p2's columns are renamed so the positional intersection below
    // is an unambiguous equi-join (p1/p2 share the match lineage)
    val p2 = f.filter(col("tok") === col("__w2"))
      .select(col(idCol).as("__id2"), col("pos").as("__pos2"))
    p1.join(p2, col("__id2") === col(idCol) &&
        col("__pos2") === col("pos") + 1)
      .select(col(idCol), col("pos"))
  }

  /** Storage bucket for a term — the partition key of a term-bucketed
    * postings layout. A pure FOLDABLE function of the token: on a
    * literal term it constant-folds, so a phrase query's bucket
    * filter becomes a static PartitionFilter (whole directories
    * skipped), while `tok` equality pushes into the row-group scan.
    * That's the "term-pruned" scan the phrase join's scale recipe
    * promises; [[prunedForPhrase]] composes both filters. */
  def termBucket(tok: Column, buckets: Int): Column =
    pmod(xxhash64(tok), lit(buckets.toLong))

  /** Prune a term-bucketed postings read to exactly a two-term
    * phrase's data: partition pruning on `bucketCol` (foldable
    * [[termBucket]] of each literal term) + row-level pushdown on
    * `tok`. The result feeds [[phraseHits]] unchanged — candidate
    * postings only, never the full index. */
  def prunedForPhrase(postings: DataFrame, bucketCol: String,
      w1: String, w2: String, buckets: Int): DataFrame =
    postings.filter(
      (col(bucketCol) === termBucket(lit(w1), buckets) ||
        col(bucketCol) === termBucket(lit(w2), buckets)) &&
        col("tok").isin(w1, w2))

  /** The corpus's most frequent bigram as a one-row (w1, w2) frame —
    * deterministic tiebreak by gram text. */
  def topBigram(docs: DataFrame, textCol: String): DataFrame = {
    val us = "\u001f"
    graft.Tables.fanOut(docs.select(col(textCol)))
      .select(explode(
        TextOps.grams(TextOps.tokens(col(textCol)), 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g"))
      .limit(1)
      .select(substring_index(col("g"), us, 1).as("w1"),
        substring_index(col("g"), us, -1).as("w2"))
  }
}
