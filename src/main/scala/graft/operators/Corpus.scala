package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * within-document repetition signal needs the multiset. */
  def shingleList(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** (doc_id, g) rows: each document's DISTINCT n-gram shingles,
    * exploded. The building block for document-frequency passes. */
  def docShingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
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
    * shingles that are in the corpus boilerplate set. Left join on
    * the shingle (hit flag), then one per-doc aggregation. */
  def boilerplateFraction(docs: DataFrame, idCol: String,
      textCol: String, n: Int, minDf: Long): DataFrame = {
    val sh = docShingles(docs, idCol, textCol, n)
    val boiler = boilerplateShingles(docs, idCol, textCol, n, minDf)
      .select(col("g"), lit(1L).as("__hit"))
    sh.join(boiler, Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_boiler"))
  }

  /** Per-held-out-document contamination: the fraction of its
    * distinct n-gram shingles that also occur anywhere in the train
    * split. `assignCol` must evaluate to 'train'/'test' per row. */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      assignCol: Column, n: Int): DataFrame = {
    val sh = docs
      .withColumn("__split", assignCol)
      .select(col(idCol).as("doc_id"), col("__split"),
        explode(Dedup.shingleSet(col(textCol), n)).as("g"))
    val trainSet = sh.filter(col("__split") === "train")
      .select(col("g")).distinct()
      .withColumn("__hit", lit(1L))
    sh.filter(col("__split") === "test")
      .join(trainSet, Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
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
}
