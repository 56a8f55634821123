package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{BigramLm, Postings, Repetition, TextOps}

/** Hand-computed fixtures for the corpus-signal operators: the
  * repetition rule set, the bigram-LM scorer, and the positional
  * inverted index / phrase intersection. */
class SignalsSpec extends SparkSpec {
  import spark.implicits._

  private val US = "\u001f"

  test("TextOps.grams builds exact positional n-grams") {
    val df = Seq("a b c d", "x y", "z", "").toDF("text")
      .select(TextOps.grams(TextOps.tokens(col("text")), 3).as("g"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(
      List(s"a${US}b${US}c", s"b${US}c${US}d"),
      Nil, Nil, Nil))
    val bi = Seq("a b c").toDF("text")
      .select(TextOps.grams(TextOps.tokens(col("text")), 2).as("g"))
      .collect().head.getSeq[String](0).toList
    assert(bi === List(s"a${US}b", s"b${US}c"))
  }

  test("Repetition.signals matches hand-computed shares") {
    val docs = Seq(
      (1L, "a a a a"),     // top1 4/4, top2 "a a" 3/3, dup3 "a a a" 2/2
      (2L, "a b c d e"),   // no repetition at all
      (3L, "a b a b a b")  // top1 3/6, top2 "a b" 3/5, trigram dups:
                           // aba x2, bab x2 -> 4/4
    ).toDF("id", "text")
    val got = Repetition.signals(docs, "id", "text")
      .orderBy(col("id"))
      .select(col("id"), col("n_toks"), col("top1_share"),
        col("top2_share"), col("dup3_frac"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toList
    assert(got === List(
      (1L, 4L, 1.0, 1.0, 1.0),
      (2L, 5L, 0.2, 0.25, 0.0),
      (3L, 6L, 0.5, 0.6, 1.0)))
  }

  test("Repetition.signals drops docs under 3 tokens") {
    val docs = Seq((1L, "a b"), (2L, "a"), (3L, ""), (4L, "a b c"))
      .toDF("id", "text")
    val ids = Repetition.signals(docs, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(ids === Set(4L))
  }

  test("BigramLm.scoreDocs matches a hand-built add-one model") {
    // corpus: "a b" x2 (docs 1,2), "a c" (doc 3)
    // model: c(a,b)=2, c(a,c)=1; prefix c(a)=3; V=3 (a,b,c)
    // p(ab) = (2+1)/(3+3) = 0.5 -> 500000000 nano
    // p(ac) = (1+1)/(3+3) = 1/3 -> 333333333 nano
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("id", "text")
    val got = BigramLm.scoreDocs(docs, "id", "text")
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    assert(got === List(
      (1L, 1L, 500000000L), (2L, 1L, 500000000L),
      (3L, 1L, 333333333L)))
  }

  test("BigramLm V excludes tokens seen only in transition-less docs") {
    // docs: "a b" (one transition) and "z" (one token, NO transition).
    // Model vocabulary V is the TRANSITION token set {a, b} = 2 — the
    // corpus-unigram definition would count z and give V=3. Pins:
    // p(ab) = (1+1)/(1+2) = 2/3 -> 666666667 nano (V=3 would give
    // (1+1)/(1+3) = 0.5 -> 500000000). Doc 2 is absent (no bigrams).
    val docs = Seq((1L, "a b"), (2L, "z")).toDF("id", "text")
    val got = BigramLm.scoreDocs(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    assert(got === List((1L, 1L, 666666667L)))
  }

  test("BigramLm mean is the floor of the nano-sum over transitions") {
    // single doc "a b a c": bigrams ab, ba, ac
    // counts: ab=1, ba=1, ac=1; prefixes: a=2, b=1; V=3
    // p(ab) = 2/5 -> 400000000; p(ba) = 2/4 -> 500000000
    // p(ac) = 2/5 -> 400000000; mean = 1300000000/3 = 433333333
    val docs = Seq((1L, "a b a c")).toDF("id", "text")
    val got = BigramLm.scoreDocs(docs, "id", "text").collect().head
    assert((got.getLong(1), got.getLong(2)) === (3L, 433333333L))
  }

  test("Postings positional index and phrase intersection") {
    val docs = Seq(
      (1L, "the cat sat on the cat mat"),
      (2L, "the cat"),
      (3L, "cat the cat the")).toDF("id", "text")
    val posts = Postings.positional(docs, "id", "text")
    assert(posts.count() === 13L)
    assert(posts.filter(col("id") === 1L && col("tok") === "cat")
      .select("pos").as[Long].collect().sorted.toList === List(2L, 6L))

    val phrase = Seq(("the", "cat")).toDF("w1", "w2")
    val hits = Postings.phraseHits(posts, "id", phrase, "w1", "w2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc1: "the cat" at 1 and 5; doc2: at 1; doc3: "the cat" at 2
    assert(hits === Set((1L, 1L), (1L, 5L), (2L, 1L), (3L, 2L)))
  }

  test("Postings.topBigram picks the most frequent bigram with tiebreak") {
    // "b c" x3 beats "a b" x2; tie between "x y"/"w z" would break
    // lexicographically but is not exercised here
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "b c"))
      .toDF("id", "text")
    val Row(w1: String, w2: String) =
      Postings.topBigram(docs, "text").collect().head
    assert((w1, w2) === ("b", "c"))
  }

  // ---- cross-domain scoring (q219) ----

  test("BigramLm.scoreAgainst(d, d) equals scoreDocs(d)") {
    val docs = Seq((1L, "a b a c"), (2L, "a b"), (3L, "c a b"))
      .toDF("id", "text")
    val a = BigramLm.scoreDocs(docs, "id", "text")
      .orderBy(col("id")).collect().toList
    val b = BigramLm.scoreAgainst(docs, docs, "id", "text")
      .orderBy(col("id")).collect().toList
    assert(a === b)
  }

  test("BigramLm.scoreAgainst smooths unseen grams instead of dropping them") {
    // train: "a b" -> model c(a,b)=1, prefix c(a)=1, V={a,b}=2
    // score doc "a b x y":
    //   ab seen:    (1+1)/(1+2) = 2/3 -> 666666667
    //   bx unseen prefix b: (0+1)/(0+2) = 1/2 -> 500000000
    //   xy unseen prefix x: (0+1)/(0+2) = 1/2 -> 500000000
    // mean = 1666666667/3 = 555555555
    val train = Seq((10L, "a b")).toDF("id", "text")
    val score = Seq((1L, "a b x y")).toDF("id", "text")
    val got = BigramLm.scoreAgainst(train, score, "id", "text")
      .collect().head
    assert((got.getLong(1), got.getLong(2)) === (3L, 555555555L))
  }

  test("BigramLm.scoreAgainst: in-domain text outscores out-of-domain") {
    val train = Seq((10L, "the quick fox the quick fox"))
      .toDF("id", "text")
    val score = Seq((1L, "the quick fox"), (2L, "lorem ipsum dolor"))
      .toDF("id", "text")
    val got = BigramLm.scoreAgainst(train, score, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) > got(2L))
  }
}
