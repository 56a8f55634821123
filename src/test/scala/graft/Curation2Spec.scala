package graft

import org.apache.spark.sql.functions._
import graft.operators.{Importance, Similarity, Sq8}

/** Unit semantics for q166/q167: importance weighting orders docs by
  * target-likeness; int8 re-rank search degrades gracefully and, at
  * full oversample, is EXACTLY brute force.
  */
class Curation2Spec extends SparkSpec {
  import spark.implicits._

  test("importance: target-like docs outrank off-domain docs") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", true),
      (2L, "alpha beta gamma delta alpha beta", true),
      (3L, "alpha beta gamma delta gamma delta", false),
      (4L, "gamma delta gamma delta gamma delta", false),
      (5L, "gamma delta epsilon zeta gamma delta", false))
      .toDF("doc_id", "text", "tgt")
    val imp = Importance
      .hashedNgramWeights(docs, "doc_id", "text", "tgt")
      .select("doc_id", "imp_nano").as[(Long, Long)].collect().toMap
    // docs made of target bigrams score above docs of raw-only ones
    assert(imp(1L) > imp(3L) && imp(3L) > imp(4L))
    // mixed doc sits between the pure ones
    assert(imp(2L) > imp(3L) && imp(1L) >= imp(2L))
  }

  test("importance: score is partition-layout independent") {
    val docs = Tables.documents(spark, sf()).limit(60)
      .withColumn("tgt", col("lang") === "en")
    val a = Importance
      .hashedNgramWeights(docs.repartition(1), "doc_id", "text", "tgt")
      .orderBy("doc_id").collect().toSeq
    val b = Importance
      .hashedNgramWeights(docs.repartition(5, col("text")),
        "doc_id", "text", "tgt")
      .orderBy("doc_id").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("sq8: full oversample equals exact brute-force top-k") {
    val e = Tables.embeddings(spark, sf())
    val n = e.count().toInt
    val q = e.filter(col("vec_id") < 5)
    val viaSq8 = Sq8.searchTopK(q, e, "vec_id", "embedding",
        m = n, k = 4)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("cos"), 9).as("cos"))
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    val brute = Similarity.topKBrute(q, e, "vec_id", "embedding", 4)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("cos"), 9).as("cos"))
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    assert(viaSq8 === brute && brute.size === 20)
  }

  test("sq8: modest oversample keeps high recall vs exact") {
    val e = Tables.embeddings(spark, sf())
    val q = e.filter(col("vec_id") < 10)
    val approx = Sq8.searchTopK(q, e, "vec_id", "embedding",
        m = 20, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.topKBrute(q, e, "vec_id", "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@5 was $recall")
  }

  test("sq8: rejects m < k") {
    val e = Tables.embeddings(spark, sf())
    intercept[IllegalArgumentException] {
      Sq8.searchTopK(e, e, "vec_id", "embedding", m = 3, k = 5)
    }
  }
}
