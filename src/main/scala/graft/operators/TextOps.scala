package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM training-data pipelines
  * (SURVEY.md §2.B G15): tokenization, counting, quality scoring,
  * document fingerprinting, and a character-n-gram language-ID
  * heuristic. Everything is a pure Column expression (codegen'd,
  * no UDFs) so it rides inside whole-stage codegen at any scale —
  * the per-document work is embarrassingly parallel, no shuffle.
  *
  * Generalizes the reference's string assembly/parse surface
  * (task.ts:213 split, task.ts:254-286 remarks builder) to corpus
  * scale.
  */
object TextOps {

  private val P = 1000000007L

  /** Whitespace tokenizer dropping empty tokens. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** BPE-ish subword count proxy: whitespace tokens plus an extra
    * count for every 4 chars of long tokens (a cheap, deterministic
    * stand-in for a real tokenizer's subword splits). */
  def tokenCountBpeIsh(text: Column): Column = {
    val toks = tokens(text)
    size(toks) + aggregate(toks, lit(0),
      (acc, t) => acc + greatest(lit(0),
        floor((length(t) - 1) / 4).cast("int")))
  }

  /** Exact word count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Ratio of tokens found in `stopwords` (0 when empty doc). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0d)).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(lit): _*))) /
        size(toks).cast("double"))
  }

  /** Distinct-token ratio — low values indicate boilerplate/spam. */
  def uniqueTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0d)).otherwise(
      size(array_distinct(toks)) / size(toks).cast("double"))
  }

  /** Mean token length in characters (0 when empty doc). */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0d)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / size(toks))
  }

  /** Composite document quality score in [0,1]: rewards lexical
    * diversity, penalizes stopword stuffing, saturating length
    * bonus. Deterministic rational arithmetic (no logs) so an SQL
    * oracle can reproduce it bit-for-bit. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    round(
      uniqueTokenRatio(text) * 0.4 +
        (lit(1d) - stopwordRatio(text, stopwords)) * 0.3 +
        least(tokenCount(text).cast("double") / 100d, lit(1d)) * 0.3,
      6)

  /** Order-sensitive rolling-hash fingerprint over the token stream:
    * fold of `acc*131 + (1000*len(tok) + firstCharCode) mod p`.
    * Unlike md5 of the raw text it is stable under whitespace
    * normalization; unlike a token-set hash it is order-sensitive. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => length(t) * 1000L + ascii(t)),
      lit(0L), (acc, x) => (acc * 131L + x) % P)

  /** Content hash for exact dedup (whitespace-sensitive). */
  def contentHash(text: Column): Column = md5(text)

  /** Character n-gram profile language ID: scores the text's
    * character-trigram multiset against small per-language marker
    * profiles and returns the argmax language (ties → lexicographic).
    * Profiles are the top discriminative trigrams of each language —
    * callers supply them, keeping this a pure expression. */
  def langIdByProfiles(text: Column,
      profiles: Map[String, Seq[String]]): Column = {
    val lowered = lower(text)
    // score(lang) = number of profile trigrams present in the text
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      struct(
        (grams.map(g => when(lowered.contains(g), 1).otherwise(0))
          .reduce(_ + _) * -1).as("neg_score"),
        lit(lang).as("lang"))
    }
    // struct sort is field-order lexicographic: ascending on
    // (-score, lang) puts the best score first, lang a-z on ties.
    sort_array(array(scored: _*)).getItem(0).getField("lang")
  }
}
