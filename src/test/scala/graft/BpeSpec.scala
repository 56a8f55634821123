package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Unit cases for real BPE tokenization (q131's operator): exact
  * merge semantics against hand-computed encodings, left-to-right
  * greedy non-overlap, multi-level merges, and the learned-order
  * validity contract.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the q131 table: 'table' collapses through 4 levels
  private val M: Seq[(String, String)] = Seq(
    "l" -> "e", "a" -> "b", "t" -> "ab", "tab" -> "le",
    "e" -> "r", "o" -> "w", "s" -> "t", "a" -> "n",
    "i" -> "n", "q" -> "u", "in" -> "d", "d" -> "a")

  private def enc(words: String*): Seq[Seq[String]] =
    words.toDF("w")
      .select(split(TextOps.bpeEncodeWord(col("w"), M),
        java.util.regex.Pattern.quote("\u001f")).as("t"))
      .as[Seq[String]].collect().toSeq

  test("hand-computed encodings, including a 4-level merge chain") {
    val got = enc("table", "stream", "window", "data", "query")
    // table: t·a·b·l·e →(l,e)→ t·a·b·le →(a,b)→ t·ab·le
    //        →(t,ab)→ tab·le →(tab,le)→ table
    assert(got(0) == Seq("table"))
    // stream: only (s,t) fires
    assert(got(1) == Seq("st", "r", "e", "a", "m"))
    // window: (o,w) → (i,n) → (in,d) — later rules consume earlier
    // products on the LEFT side too
    assert(got(2) == Seq("w", "ind", "ow"))
    assert(got(3) == Seq("da", "t", "a"))
    // query: (e,r) fires before (q,u) in rank order
    assert(got(4) == Seq("qu", "er", "y"))
  }

  test("left-to-right greedy: merged pair does not re-merge (aaa)") {
    val aa = Seq("a" -> "a")
    val got = Seq("aaa", "aaaa").toDF("w")
      .select(split(TextOps.bpeEncodeWord(col("w"), aa),
        java.util.regex.Pattern.quote("\u001f")).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("aa", "a"))
    assert(got(1) == Seq("aa", "aa"))
  }

  test("bpeTokens flattens words in order; count matches size") {
    val df = Seq("the data table", "").toDF("text")
      .select(TextOps.bpeTokens(col("text"), M).as("toks"),
        TextOps.bpeTokenCount(col("text"), M).as("n"))
    val rows = df.as[(Seq[String], Int)].collect().toSeq
    assert(rows(0)._1 ==
      Seq("t", "h", "e", "da", "t", "a", "table"))
    assert(rows(0)._2 == 7)
    assert(rows(1) == ((Seq.empty, 0)))
  }

  test("single-char and empty-ish words survive") {
    val got = enc("a", "x")
    assert(got == Seq(Seq("a"), Seq("x")))
  }

  test("out-of-learned-order table is rejected eagerly") {
    // (t,ab) before (a,b): 'ab' not yet produced
    val bad = Seq("t" -> "ab", "a" -> "b")
    val e = intercept[IllegalArgumentException] {
      TextOps.bpeEncodeWord(col("w"), bad)
    }
    assert(e.getMessage.contains("learned order"), e.getMessage)
    // multi-char separator rejected
    intercept[IllegalArgumentException] {
      TextOps.bpeEncodeWord(col("w"), M, sep = "ab")
    }
  }
}
