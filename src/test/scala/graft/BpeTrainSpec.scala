package graft

import graft.operators.BpeTrain

/** Unit semantics for [[BpeTrain.learnMerges]] (q190): a fully
  * hand-traced learning run, the tie rule, the leftmost-greedy
  * overlap rule, early exhaustion, and empty input.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def toks(docs: Seq[(Long, String)]) =
    BpeTrain.charTokens(docs.toDF("doc_id", "text"), "doc_id",
      "text", limit = 100)

  private def merges(docs: Seq[(Long, String)], rounds: Int) =
    BpeTrain.learnMerges(toks(docs), rounds)._1
      .map(m => (m.round, m.a, m.b, m.n))

  test("hand-traced run on 'abcabcab' (ties break lexicographically)") {
    // r1: (a,b)x3 -> [ab c ab c ab]
    // r2: (ab,c)x2 ties (c,ab)x2, 'ab' < 'c' -> [abc abc ab]
    // r3: (abc,abc) ties (abc,ab) on a; b 'ab' < 'abc'
    //     -> merge (abc,ab) at the tail -> [abc abcab]
    // r4: (abc,abcab)x1 -> [abcabcab]; r5: no pairs -> stop
    assert(merges(Seq((1L, "abcabcab")), 8) === Seq(
      (1, "a", "b", 3L),
      (2, "ab", "c", 2L),
      (3, "abc", "ab", 1L),
      (4, "abc", "abcab", 1L)))
  }

  test("leftmost-greedy: 'aaaa' merges to (aa)(aa), then aaaa") {
    assert(merges(Seq((1L, "aaaa")), 8) === Seq(
      (1, "a", "a", 3L), // 3 overlapping occurrences counted
      (2, "aa", "aa", 1L)))
  }

  test("odd run: 'aaa' leaves the trailing singleton") {
    val (ms, toksF) = BpeTrain.learnMerges(toks(Seq((1L, "aaa"))), 1)
    assert(ms.map(m => (m.a, m.b, m.n)) === Seq(("a", "a", 2L)))
    val out = toksF.orderBy("pos").select("tok").as[String]
      .collect().toSeq
    assert(out === Seq("aa", "a"))
  }

  test("counts aggregate ACROSS documents") {
    // (x,y) appears once per doc -> corpus count 3 beats any
    // within-doc pair
    val ms = merges(Seq((1L, "xyab"), (2L, "xycd"), (3L, "xyef")), 1)
    assert(ms === Seq((1, "x", "y", 3L)))
  }

  test("empty corpus learns nothing") {
    val (ms, toksF) =
      BpeTrain.learnMerges(toks(Seq.empty[(Long, String)]), 4)
    assert(ms.isEmpty && toksF.count() === 0L)
  }

  test("rounds bound respected; final tokens re-indexed per doc") {
    val (_, toksF) = BpeTrain.learnMerges(toks(Seq((1L, "ababab"))), 1)
    val out = toksF.orderBy("pos")
      .select("pos", "tok").as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "ab"), (2L, "ab"), (3L, "ab")))
  }
}
