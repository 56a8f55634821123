package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.{Curate, Graph, TextClassifier}

/** Semantics of the CCNet/fastText-style hashed-bigram classifier
  * ([[graft.operators.TextClassifier]], q255).
  *
  * The reference is an INDEPENDENT plain-Scala re-derivation of the
  * whole chain — tokenize, bigram, md5 bucket, add-one NB log-odds
  * with the fixed-point ln, integer dot — so a regression in the
  * relational algebra cannot self-verify.
  */
class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256

  // ---- independent reference chain ----

  private def lnPpmRef(d: Long): Long = {
    require(d >= 1)
    val bl = 63 - java.lang.Long.numberOfLeadingZeros(d)
    val sh = bl - 9
    val (m, r) =
      if (sh >= 0) (d >> sh, d - ((d >> sh) << sh))
      else (d << (-sh), 0L)
    val corr =
      if (sh > 0) (BigInt(r) * 1000000 / (BigInt(m) << sh)).toLong
      else 0L
    Graph.lnMantissaPpm((m - 512).toInt) + sh * 693147L + corr
  }

  private def bucketOf(gram: String): Int = {
    val h = MessageDigest.getInstance("MD5")
      .digest(gram.getBytes(StandardCharsets.UTF_8))
    (h(0) & 0xff) % B
  }

  /** whitespace-ish tokens, mirroring TextOps.tokens' contract on
    * the plain-ASCII fixtures used here */
  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def counts(text: String): Map[Int, Long] =
    toks(text).sliding(2).filter(_.size == 2)
      .map(p => bucketOf(p.mkString(" ")))
      .toSeq.groupBy(identity).map { case (b, g) => b -> g.size.toLong }

  private def refWeights(labeled: Seq[(String, Boolean)])
      : Map[Int, Long] = {
    val all = labeled.map { case (t, y) => (counts(t), y) }
    val buckets = all.flatMap(_._1.keys).distinct
    val pB = buckets.map(b => b ->
      all.filter(_._2).map(_._1.getOrElse(b, 0L)).sum).toMap
    val nB = buckets.map(b => b ->
      all.filterNot(_._2).map(_._1.getOrElse(b, 0L)).sum).toMap
    val pt = pB.values.sum + B
    val nt = nB.values.sum + B
    buckets.map(b => b ->
      (lnPpmRef(pB(b) + 1) - lnPpmRef(pt) -
        lnPpmRef(nB(b) + 1) + lnPpmRef(nt))).toMap
  }

  private def refScore(text: String, w: Map[Int, Long])
      : (Long, Long) = {
    val c = counts(text)
    (c.values.sum,
      c.map { case (b, n) => BigInt(n) * BigInt(w.getOrElse(b, 0L)) }
        .sum.toLong)
  }

  // ---- fixtures ----

  private val labeled = Seq(
    ("the quick brown fox jumps over the lazy dog", true),
    ("a clean well formed english sentence appears here", true),
    ("click here buy now free offer click here buy now", false),
    ("zzz qqq xxx www spam spam spam link link link", false))

  private val unlabeledJunk = "buy now click here free offer spam link"
  private val unlabeledGood = "the quick brown fox appears here"

  test("trained weights match the independent reference") {
    val df = labeled.zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "y")
    val got = TextClassifier.nbLogOddsWeights(df, "doc_id", "text",
        "y", B)
      .as[(Int, Long)].collect().toMap
    assert(got == refWeights(labeled))
  }

  test("scores and keep decisions match the hand chain; junk drops") {
    val train = labeled.zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "y")
    val w = TextClassifier.nbLogOddsWeights(train, "doc_id", "text",
      "y", B)
    val infer = Seq((100L, unlabeledJunk), (101L, unlabeledGood))
      .toDF("doc_id", "text")
    val got = TextClassifier.scoreDocs(infer, "doc_id", "text", w, B)
      .select(col("doc_id"), col("n_feats"), col("llr_ppm"),
        col("keep"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val rw = refWeights(labeled)
    Seq(100L -> unlabeledJunk, 101L -> unlabeledGood).foreach {
      case (id, text) =>
        val (n, llr) = refScore(text, rw)
        assert(got(id) == ((n, llr, llr > 0)), s"doc $id")
    }
    // the labels did their job: spam scores negative, english positive
    assert(!got(100L)._3 && got(101L)._3)
  }

  test("null-labeled docs are excluded from training") {
    val df = (labeled.zipWithIndex.map { case ((t, y), i) =>
        (i.toLong, t, Some(y)) } :+
        ((99L, "the quick brown fox of nobody knows", None)))
      .toDF("doc_id", "text", "y")
    val withNull = TextClassifier.nbLogOddsWeights(df, "doc_id",
      "text", "y", B).as[(Int, Long)].collect().toMap
    assert(withNull == refWeights(labeled))
  }

  test("llrExpr (aggregation-free streaming form) is bit-equal to scoreDocs") {
    val train = labeled.zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "y")
    val w = TextClassifier.nbLogOddsWeights(train, "doc_id", "text",
      "y", B)
    val wMap = TextClassifier.collectWeights(w)
    assert(wMap == w.as[(Int, Long)].collect().toMap)
    val infer = (labeled.map(_._1) ++
      Seq(unlabeledJunk, unlabeledGood, "solo"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // per-row expression form, gated the way corpusIngest gates
    val viaExpr = infer
      .select(col("doc_id"),
        TextClassifier.numFeatsExpr(col("text")).as("n_feats"),
        TextClassifier.llrExpr(col("text"), wMap, B).as("llr_ppm"))
      .filter(col("n_feats") >= 1L)
      .withColumn("keep", col("llr_ppm") > 0L)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // relational form (explode + broadcast join + groupBy)
    val viaAgg = TextClassifier.scoreDocs(infer, "doc_id", "text", w, B)
      .select(col("doc_id"), col("n_feats"), col("llr_ppm"),
        col("keep"))
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(viaExpr == viaAgg)
    // the 1-token doc (id 6) is absent from both forms: no
    // evidence, no verdict
    val soloId = labeled.size + 2L
    assert(!viaAgg.exists(_._1 == soloId))
    assert(viaAgg.size == labeled.size + 2)
  }

  test("composes as the model gate in front of Curate.curate") {
    // classifier keeps → curation pipeline; the junk doc never
    // reaches dedup/quality, the good one survives end to end
    val train = labeled.zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "y")
    val w = TextClassifier.nbLogOddsWeights(train, "doc_id", "text",
      "y", B)
    val corpus = Seq(
      (200L, "the quick brown fox appears here in the morning light"),
      (201L, "the quick brown fox appears here in the morning light"),
      (202L, "buy now click here free offer spam link spam link"))
      .toDF("doc_id", "text")
    val kept = TextClassifier.scoreDocs(corpus, "doc_id", "text", w, B)
      .filter(col("keep")).select(col("doc_id"))
    val gated = corpus.join(kept, Seq("doc_id"), "left_semi")
    val curated = Curate.curate(gated, "doc_id", "text",
        minQuality = 0.0)
      .select(col("id")).as[Long].collect().toSet
    // 202 dropped by the model gate, 201 by exact dedup
    assert(curated == Set(200L))
  }
}
