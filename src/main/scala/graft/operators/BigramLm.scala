package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus bigram language model + per-document likelihood scoring —
  * the classic cheap "perplexity-ish" quality signal (a small LM
  * scores every candidate document; statistical outliers are gibberish
  * or boilerplate). The model is add-one-smoothed bigram transition
  * probability p(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V) with c(w1·) the
  * bigram-prefix count and V the model vocabulary — the distinct
  * tokens observed in any transition (w1 ∪ w2 over the bigram
  * stream); a document scores the MEAN transition probability over
  * its bigrams. Defining V over the transition stream (rather than
  * re-tokenizing the corpus for a unigram count) keeps the model
  * self-contained AND removes a second full scan of the text column:
  * V is derived from the already-aggregated model relation, so the
  * corpus text is tokenized exactly once. The only tokens the two
  * definitions disagree on are those appearing solely in one-token
  * documents — which contribute no transitions and are never scored.
  *
  * Mean probability (not mean log-prob) is deliberate: every p is a
  * ratio of exact counts — one IEEE division — and is snapped to
  * integer nano-units before the per-document sum, so both engines
  * aggregate INTEGERS in any order and the final mean is one integer
  * division. A log-based score would hash-differently across engines
  * (libm ln is not guaranteed correctly rounded); the ranking this
  * signal exists for is monotone-equivalent under mean-p vs docs of
  * equal length anyway.
  *
  * Scale shape: the raw gram stream is aggregated ONCE to (doc, w1,
  * w2, cnt) — a partial-aggregable shuffle that collapses the
  * within-doc duplicate factor (large on Zipfian text) before
  * anything else touches it; the model is a second, model-sized
  * aggregate OF that relation (the exchange is reused, the text is
  * tokenized exactly once); prefix counts derive from the model
  * itself; scoring joins the per-doc gram counts to the model on
  * (w1,w2) — a plain equi-join that AQE can broadcast when the
  * model is small and shuffle when it isn't — weighting each
  * distinct gram's p by its count, then one per-document aggregate.
  * Nothing is ever collected to the driver.
  */
object BigramLm {

  private val US = "\u001f"

  /** Per-document mean transition probability under the corpus's own
    * add-one bigram model.
    * @return (idCol, n_trans, score_nano): n_trans = #bigrams in the
    *         doc, score_nano = floor-mean of floor(p·1e9+0.5) —
    *         integer, deterministic; score_nano/1e9 ≈ mean p. Docs
    *         with < 2 tokens (no transitions) are absent. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    // fanOut BEFORE tokenizing (r15, guide §2.5 input skew / §6 split
    // size): a single-row-group parquet corpus scans as ONE task, and
    // the tokenize+gram explode — the most expensive per-row work in
    // the text family — serializes on it; identity at scale, where
    // the corpus always scans wide
    val pairs = graft.Tables
      .fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(TextOps.grams(toks, 2)).as("g"))
      .select(col(idCol),
        substring_index(col("g"), US, 1).as("w1"),
        substring_index(col("g"), US, -1).as("w2"))
    // collapse per-occurrence grams to (doc, w1, w2, cnt) FIRST: the
    // model, and the scoring join's input, both shrink by the
    // within-doc duplicate factor; this exchange feeds everything
    val docGrams = pairs.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    val model = docGrams.groupBy(col("w1"), col("w2"))
      .agg(sum(col("cnt")).as("c12"))
    val prefix = model.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    // model-sized, not corpus-sized: V from the model's own token set
    // (prefix, vocab, and the scoring join all consume the same
    // aggregated relation — AQE reuses it instead of re-scanning text)
    val vocab = model
      .select(explode(array(col("w1"), col("w2"))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val scored = docGrams
      .join(model, Seq("w1", "w2"))
      .join(prefix, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("cnt"),
        floor((col("c12") + lit(1)).cast("double")
            / (col("c1") + col("v")).cast("double") * lit(1e9) + lit(0.5))
          .cast("long").as("p_nano"))
    scored.groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_trans"),
        sum(col("p_nano") * col("cnt")).as("s_nano"))
      .select(col(idCol), col("n_trans"),
        expr("s_nano div n_trans").as("score_nano"))
  }

  /** Score one corpus under a model trained on ANOTHER — the
    * cross-domain form behind importance-style data selection
    * (q219): train the add-one bigram model on `train`, score every
    * document of `score`. Unlike [[scoreDocs]] (train == score, so
    * every gram is in-model), a scored gram may be UNSEEN: the left
    * joins keep it and add-one smoothing gives it its floor
    * probability 1/(c1+V) (prefix seen) or 1/V (prefix unseen) —
    * exactly the smoothing's job; dropping unseen grams would
    * instead reward out-of-domain text. Same integer nano-unit
    * contract and scale shape as [[scoreDocs]] (one tokenization
    * per corpus, model-sized aggregates, AQE-broadcastable scoring
    * join).
    * @return (idCol, n_trans, score_nano) over `score`'s documents */
  def scoreAgainst(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String): DataFrame =
    scoreAgainstGrams(docGrams(train, idCol, textCol),
      docGrams(score, idCol, textCol), idCol)

  /** The per-document aggregated gram relation (id, w1, w2, cnt) —
    * exposed so a caller scoring one corpus under SEVERAL models
    * (q219: target model + corpus model over the same documents)
    * can tokenize ONCE, checkpoint, and feed every model and every
    * scoring pass from the same frame instead of re-tokenizing per
    * use. */
  def docGrams(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    // fanOut before the tokenize+explode — see [[scoreDocs]]
    graft.Tables.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(TextOps.grams(toks, 2)).as("g"))
      .select(col(idCol),
        substring_index(col("g"), US, 1).as("w1"),
        substring_index(col("g"), US, -1).as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[scoreAgainst]] on pre-aggregated [[docGrams]] relations. */
  def scoreAgainstGrams(trainGrams: DataFrame, scoreGrams: DataFrame,
      idCol: String): DataFrame = {
    val model = trainGrams.groupBy(col("w1"), col("w2"))
      .agg(sum(col("cnt")).as("c12"))
    val prefix = model.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = model
      .select(explode(array(col("w1"), col("w2"))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val scored = scoreGrams
      .join(model, Seq("w1", "w2"), "left")
      .join(prefix, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("cnt"),
        floor((coalesce(col("c12"), lit(0L)) + lit(1)).cast("double")
            / (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")
            * lit(1e9) + lit(0.5))
          .cast("long").as("p_nano"))
    scored.groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_trans"),
        sum(col("p_nano") * col("cnt")).as("s_nano"))
      .select(col(idCol), col("n_trans"),
        expr("s_nano div n_trans").as("score_nano"))
  }
}
