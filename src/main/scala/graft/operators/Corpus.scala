package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level curation signals for LLM training-data pipelines —
  * the cross-document passes that complement the per-document
  * [[TextOps]] metrics and the [[Dedup]]/[[Curate]] dedup stack:
  *
  *  - boilerplate n-gram detection (C4-style: shingles shared by
  *    many documents are template/boilerplate text, and a document's
  *    boilerplate fraction is a quality gate signal),
  *  - train/test contamination measurement (the decontamination
  *    pass every benchmark-clean training set needs: fraction of a
  *    held-out document's shingles that leak from the train split),
  *  - greedy sequence packing statistics (concat-then-chunk packing
  *    of documents into fixed token windows for pretraining
  *    batches).
  *
  * All shapes are single-shuffle: one explode→groupBy for the
  * shingle frequency table, one equi-join on the shingle string for
  * membership. At 100 TB the membership join keys would be
  * compacted to xxhash64(shingle) (8-byte keys, collision-tolerable
  * for a fraction estimate) or the train set distilled into a bloom
  * filter broadcast; the string-keyed join here is the exact
  * formulation both engines can verify.
  */
object Corpus {

  /** Word n-gram shingles of `text`, one per position — duplicates
    * KEPT (cf. [[Dedup.shingleSet]] which distincts them): the
    * within-document repetition signal needs the multiset. Same
    * native kernel as shingleSet ([[graft.functions.ShingleNGrams]])
    * with distinct=false. */
  def shingleList(text: Column, n: Int): Column =
    call_function("shingles", TextOps.tokens(text), lit(n), lit(false))


  /** Vocabulary-coverage estimation over the corpus n-gram multiset
    * — "how much of the population vocabulary has this crawl
    * actually seen?": the Good-Turing unseen-probability mass
    * (f1/N — the chance the NEXT gram drawn is novel) and the
    * bias-corrected Chao1 richness estimate
    * (D + f1·(f1−1)/(2·(f2+1)), defined even when no doubletons
    * exist), both exact integers from the frequency-of-frequencies
    * histogram. The coverage dial a corpus-growth decision reads:
    * high unseen mass ⇒ keep crawling, Chao1 ≈ D ⇒ saturated.
    *
    * Scale shape: one explode + partial-aggregated groupBy on the
    * gram (the corpus-sized shuffle every vocabulary pass pays);
    * everything after is a scalar aggregate of that frequency
    * relation. Returns one row. */
  def vocabCoverage(docs: DataFrame, textCol: String,
      n: Int): DataFrame =
    graft.Tables.fanOut(docs)
      .select(explode(shingleList(col(textCol), n)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("d_distinct"),
        sum(col("c")).as("n_grams"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("n_grams"), col("d_distinct"), col("f1"),
        col("f2"),
        expr("(cast(f1 as decimal(38,0)) * 1000000) div n_grams")
          .as("gt_unseen_ppm"),
        expr("(cast(f1 as decimal(38,0)) * (f1 - 1))" +
          " div (2 * (f2 + 1))").as("chao1_extra"))
      .withColumn("chao1_total",
        col("d_distinct") + col("chao1_extra"))

  /** (doc_id, g) rows: each document's DISTINCT n-gram shingles,
    * exploded. The building block for document-frequency passes. */
  def docShingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    graft.Tables.fanOut(docs).select(col(idCol).as("doc_id"),
      explode(Dedup.shingleSet(col(textCol), n)).as("g"))

  /** Shingles appearing in ≥ minDf distinct documents — the
    * boilerplate/template set. One explode + one groupBy shuffle on
    * the shingle; df counts are exact (shingles are per-doc
    * distinct upstream, so count(*) IS document frequency). */
  def boilerplateShingles(docs: DataFrame, idCol: String,
      textCol: String, n: Int, minDf: Long): DataFrame =
    docShingles(docs, idCol, textCol, n)
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  /** Per-document boilerplate fraction: share of the doc's distinct
    * shingles that are in the corpus boilerplate set. Implemented as
    * df-count-over-window on the shingle partition: ONE explode and
    * one shuffle by shingle (the same volume the df groupBy would
    * shuffle anyway), no second scan and no membership join. The
    * alternative (df groupBy + broadcast the boilerplate set back
    * onto a re-scan) wins only when re-scanning the corpus is
    * cheaper than windowing the shingle rows — with a payload-
    * pruned scan both shapes shuffle identically, and this one
    * reads the data once. */
  def boilerplateFraction(docs: DataFrame, idCol: String,
      textCol: String, n: Int, minDf: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g"))
    docShingles(docs, idCol, textCol, n)
      .withColumn("__df", count(lit(1)).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= minDf, 1L).otherwise(0L))
          .as("n_boiler"))
  }

  /** Per-held-out-document contamination: the fraction of its
    * distinct n-gram shingles that also occur anywhere in the train
    * split. `assignCol` must evaluate to 'train'/'test' per row.
    *
    * Shape: ONE explode, then leaked = max(is_train) over the
    * shingle partition — a single shuffle by shingle touching each
    * (doc, shingle) row once. The equi-join formulation shuffles
    * the same test rows AND a corpus-sized distinct train set; the
    * window does strictly less movement because the train set here
    * is not small (it is most of the corpus). */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      assignCol: Column, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g"))
    graft.Tables.fanOut(docs)
      .withColumn("__split", assignCol)
      .select(col(idCol).as("doc_id"), col("__split"),
        explode(Dedup.shingleSet(col(textCol), n)).as("g"))
      .withColumn("__hit",
        max(when(col("__split") === "train", 1L).otherwise(0L)).over(w))
      .filter(col("__split") === "test")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("__hit")).as("n_contaminated"))
  }

  /** Greedy concat-then-chunk sequence packing: documents ordered by
    * `orderCol` within each `groupCol` stream are laid end-to-end
    * and cut into fixed `window`-token bins; a document's bin is the
    * window containing its START offset. One window shuffle per
    * group (the partition key), deterministic given a unique order
    * column. */
  def packBins(docs: DataFrame, groupCol: String, orderCol: String,
      tokenCol: Column, window: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
    docs.withColumn("__ntok", tokenCol.cast("long"))
      .withColumn("__cum", sum(col("__ntok")).over(w))
      .withColumn("bin",
        floor((col("__cum") - col("__ntok")) / lit(window))
          .cast("long"))
  }

  /** GPT-style concat-and-split sequence packing: within each shard,
    * documents are concatenated in a deterministic shuffled order and
    * the token stream is cut into fixed `seqLen`-token sequences —
    * documents CROSS sequence boundaries (unlike [[packBins]], which
    * assigns whole documents to bins). Returns one row per
    * (doc × sequence) overlap, the relation a batch loader or a
    * boundary-statistics pass aggregates.
    *
    * Scale shape: the prefix-sum window partitions on the SHARD key
    * (pretraining shards are how real pipelines bound this — there is
    * never a corpus-global token offset), so offsets are per-shard
    * per-key sorted scans after one shard exchange; the row fan-out
    * is ⌈ntok/seqLen⌉+1 per doc, map-side. Empty docs are dropped
    * (they occupy no tokens and would straddle nothing).
    *
    * @return (shard, doc = idCol, seq, tok_start, tok_end, seq_tokens,
    *         starts_here): tok_start/tok_end are the doc's half-open
    *         offsets in the shard stream, seq_tokens the tokens the
    *         doc contributes to THIS sequence, starts_here 1 iff the
    *         doc's first token lies in this sequence
    */
  def packSequences(docs: DataFrame, shardCol: Column, orderCol: Column,
      idCol: String, tokenCol: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window
      .partitionBy(col("__shard")).orderBy(col("__ord"), col(idCol))
    val s = lit(seqLen.toLong)
    docs
      .withColumn("__shard", shardCol)
      .withColumn("__ord", orderCol)
      .withColumn("__ntok", tokenCol.cast("long"))
      .filter(col("__ntok") > 0)
      .withColumn("__start",
        coalesce(sum(col("__ntok"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__end", col("__start") + col("__ntok"))
      .select(col("__shard").as("shard"), col(idCol),
        col("__start").as("tok_start"), col("__end").as("tok_end"),
        explode(sequence(
          floor(col("__start") / s).cast("long"),
          floor((col("__end") - lit(1L)) / s).cast("long"))).as("seq"))
      .withColumn("seq_tokens",
        least(col("tok_end"), (col("seq") + lit(1L)) * s) -
          greatest(col("tok_start"), col("seq") * s))
      .withColumn("starts_here",
        when(floor(col("tok_start") / s).cast("long") === col("seq"), 1L)
          .otherwise(0L))
  }

  /** Overlapping token-window chunking — the RAG/embedding prep pass
    * (split every document into fixed-size windows with `overlap`
    * shared tokens so no answer span straddles a boundary unseen).
    * Distinct from [[packSequences]]: packing concatenates MANY docs
    * into one training window; chunking splits ONE doc into many
    * retrieval units and never crosses document boundaries.
    *
    * Chunk i covers tokens [i·stride, i·stride+size) with
    * stride = size − overlap; the last chunk is the first one whose
    * window reaches the document's end (trailing shorter windows are
    * not emitted — every token is still covered, and no chunk is a
    * suffix of its predecessor). A document shorter than `size`
    * yields exactly one (short) chunk; empty documents yield none.
    *
    * Scale shape: entirely map-side — tokenize, one `sequence` +
    * `explode` fan-out of ⌈(ntok−size)/stride⌉+1 rows per doc, and a
    * per-row `slice`; no shuffle at all (the chunker composes with a
    * downstream embed/index stage which supplies its own exchange).
    *
    * @return (doc = idCol, chunk_idx, tok_start 0-based, n_tok,
    *         chunk_text: the window's tokens re-joined with single
    *         spaces) */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0, s"size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap (size $size)")
    val stride = size - overlap
    graft.Tables.fanOut(docs)
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .withColumn("__ntok",
        org.apache.spark.sql.functions.size(col("__toks")).cast("long"))
      .filter(col("__ntok") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        // ceil(max(0, ntok − size) / stride) in exact integer algebra
        expr(s"(greatest(__ntok - ${size}L, 0L) + ${stride - 1}L)" +
          s" div ${stride}L"))))
      .withColumn("tok_start", col("chunk_idx") * lit(stride.toLong))
      .withColumn("n_tok",
        least(lit(size.toLong), col("__ntok") - col("tok_start")))
      .select(col(idCol), col("chunk_idx"), col("tok_start"),
        col("n_tok"),
        concat_ws(" ", slice(col("__toks"),
          (col("tok_start") + lit(1L)).cast("int"),
          col("n_tok").cast("int"))).as("chunk_text"))
  }
}
