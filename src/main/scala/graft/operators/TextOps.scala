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

  /** Order-preserving word n-grams over a token array, each gram the
    * n consecutive tokens joined with the 0x1f unit separator (no
    * legal corpus token contains it). Built map-side from the array —
    * position i of the result covers tokens [i, i+n) — and empty when
    * the document has fewer than n tokens, so explode-consumers never
    * see a partial gram. */
  def grams(toks: Column, n: Int): Column =
    if (n == 1) toks
    else transform(
      slice(toks, lit(1), greatest(size(toks) - lit(n - 1), lit(0))),
      (x, i) => concat_ws("\u001f",
        x +: (1 until n).map(k => element_at(toks, i + lit(k + 1))): _*))

  // ---- real BPE (byte-pair encoding) tokenization ----------------
  //
  // True iterative pair merging against a LITERAL merge table in
  // learned-rank order — the upgrade from tokenCountBpeIsh's length
  // heuristic to what a training pipeline actually bills by. Each
  // merge rule is applied as one left-to-right greedy pass over a
  // word's symbol sequence; for a VALID table (each rule's two
  // symbols are single characters or the product of a strictly
  // earlier rule — the order BPE training emits by construction)
  // the in-order passes produce exactly the min-rank-pair-loop
  // tokenization of the standard encoder.
  //
  // Representation: a word's symbols as one string joined by a
  // separator char that cannot occur in the text. The fold step is
  // then branch-free string algebra: if the accumulator's LAST
  // symbol is x and the next symbol is y, merging x+y into xy is
  // just `acc || y`; otherwise `acc || sep || t`. Both engines
  // express this fold natively (Spark `aggregate`, DuckDB
  // `list_reduce`), so an oracle can replay the merges bit-for-bit.
  //
  // Scale shape: pure per-row Column expressions — no UDF, no
  // shuffle, embarrassingly parallel. Callers should encode each
  // DISTINCT word once and join frequencies back (see q131): corpus
  // token distributions are Zipfian, so the distinct-word frame is
  // orders of magnitude smaller than the token stream. The merge
  // table embeds in the plan as literals, right for the tens-to-
  // hundreds of rules a domain tokenizer carries; a production 50k-
  // rule GPT-style table wants the same per-pass fold driven from a
  // broadcast map with a bounded-unroll min-rank loop instead —
  // document-level plumbing is identical.

  /** Learned-order validity: every rule's symbols must be single
    * chars or the output of a strictly earlier rule, symbols must
    * not contain the separator. Enforced eagerly — an out-of-order
    * table silently tokenizes differently from the standard
    * encoder, which is a wrong answer, not a degraded one. */
  private def validateMerges(merges: Seq[(String, String)],
      sep: String): Unit = {
    require(sep.length == 1, s"sep must be a single char, got '$sep'")
    val produced = scala.collection.mutable.Set.empty[String]
    merges.zipWithIndex.foreach { case ((x, y), i) =>
      Seq(x, y).foreach { s =>
        require(s.nonEmpty && !s.contains(sep),
          s"merge $i ('$x','$y'): empty symbol or symbol contains sep")
        require(s.length == 1 || produced.contains(s),
          s"merge $i ('$x','$y'): '$s' is neither a single char nor " +
            "produced by an earlier rule — table is not in learned order")
      }
      produced += (x + y)
    }
  }

  /** One in-order merge pass: left-to-right greedy fold over the
    * sep-joined symbol string (see the algebra note above). */
  private def bpePass(symStr: Column, x: String, y: String,
      sep: String): Column =
    aggregate(split(symStr, java.util.regex.Pattern.quote(sep)),
      lit(""), (acc, t) =>
        when(acc === "", t)
          .when((acc === lit(x) || acc.endsWith(lit(sep + x))) &&
            t === lit(y), concat(acc, lit(y)))
          .otherwise(concat(acc, lit(sep), t)))

  /** BPE-encode ONE word: char-split, then every merge rule in
    * learned order. Returns the sep-joined symbol string (callers
    * split on `sep` for the token array). */
  def bpeEncodeWord(word: Column, merges: Seq[(String, String)],
      sep: String = "\u001f"): Column = {
    validateMerges(merges, sep)
    val init = rtrim(regexp_replace(word, "(.)", "$1" + sep), sep)
    merges.foldLeft(init) { case (s, (x, y)) => bpePass(s, x, y, sep) }
  }

  /** Subword token stream of a whole text: whitespace words, each
    * BPE-encoded, flattened in order. */
  def bpeTokens(text: Column, merges: Seq[(String, String)],
      sep: String = "\u001f"): Column = {
    val q = java.util.regex.Pattern.quote(sep)
    flatten(transform(tokens(text),
      w => split(bpeEncodeWord(w, merges, sep), q)))
  }

  /** Exact BPE token count of a text under `merges` — the billing
    * signal (context-window packing, per-token cost) a training
    * pipeline keys on. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)],
      sep: String = "\u001f"): Column =
    size(bpeTokens(text, merges, sep))

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

  /** PII masking patterns, applied IN ORDER (ssn before phone so a
    * 3-2-4 digit group reads as an SSN, never a malformed phone;
    * email first so its digits can't feed the numeric patterns).
    * Every pattern is dialect-portable regex — character classes,
    * bounded quantifiers, `\b` — identical under Java regex (Spark)
    * and RE2 (DuckDB), which is what lets an oracle replay the
    * masking byte-for-byte. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\+?\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
      "<IP>"))

  /** Redact emails, SSNs, phone numbers, and IPv4 addresses to
    * typed placeholder tokens — the pre-training scrub pass that
    * runs BEFORE text ever lands in a corpus. Pure codegen'd
    * `regexp_replace` chain: map-side, no shuffle, linear in bytes
    * scanned — the 100 TB shape is simply "one more projection on
    * the ingest scan". Masking is idempotent (placeholders match no
    * pattern). Count occurrences BEFORE masking with [[piiCounts]]
    * if an audit trail is needed. */
  def maskPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, p, repl)) =>
      regexp_replace(c, lit(p), lit(repl))
    }

  /** Per-kind PII occurrence counts over the ORIGINAL text (struct
    * of `n_email`, `n_ssn`, `n_phone`, `n_ipv4`) — the audit leg of
    * [[maskPii]]; non-overlapping counts, same portable patterns. */
  def piiCounts(text: Column): Column =
    struct(PiiPatterns.map { case (name, p, _) =>
      regexp_count(text, lit(p)).cast("long").as(s"n_$name")
    }: _*)
}
