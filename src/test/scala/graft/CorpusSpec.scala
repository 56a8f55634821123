package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup}

/** Unit-level checks of the corpus-curation operators feeding
  * q81/q82/q87 — tiny hand corpora with worked-out expectations. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("shingleList keeps the multiset where shingleSet distincts") {
    val df = Seq(("a b a b a")).toDF("text")
    val both = df.select(
      Corpus.shingleList(col("text"), 2).as("list"),
      Dedup.shingleSet(col("text"), 2).as("set"))
      .as[(Seq[String], Seq[String])].collect().head
    assert(both._1 == Seq("a b", "b a", "a b", "b a"))
    assert(both._2.sorted == Seq("a b", "b a"))
  }

  test("shingleList is empty below n tokens") {
    val r = Seq("one two", "").toDF("text")
      .select(Corpus.shingleList(col("text"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(r.forall(_.isEmpty))
  }

  test("boilerplateShingles finds shingles shared by >= minDf docs") {
    // "x y z" occurs in docs 1,2,3; "p q r" only in doc 4
    val docs = Seq(
      (1L, "x y z a"), (2L, "b x y z"), (3L, "x y z"),
      (4L, "p q r")).toDF("doc_id", "text")
    val boiler = Corpus.boilerplateShingles(docs, "doc_id", "text",
      n = 3, minDf = 3L).as[(String, Long)].collect().toMap
    assert(boiler == Map("x y z" -> 3L))
  }

  test("boilerplateFraction reports per-doc share of boilerplate shingles") {
    val docs = Seq(
      (1L, "x y z a"), (2L, "b x y z"), (3L, "x y z"),
      (4L, "p q r")).toDF("doc_id", "text")
    val frac = Corpus.boilerplateFraction(docs, "doc_id", "text", 3, 3L)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, b) => id -> ((n, b)) }.toMap
    // doc 1: shingles {x y z, y z a} -> 1 of 2 boiler
    assert(frac(1L) == ((2L, 1L)))
    assert(frac(3L) == ((1L, 1L)))
    assert(frac(4L) == ((1L, 0L)))
  }

  test("contamination measures test-shingle leakage from train") {
    val docs = Seq(
      (1L, "train", "a b c d"),   // train shingles: {a b c, b c d}
      (2L, "test", "a b c x y"),  // {a b c, b c x, c x y} -> 1/3 hit
      (3L, "test", "p q r s"))    // no overlap -> 0/2
      .toDF("doc_id", "split", "text")
    val r = Corpus.contamination(docs, "doc_id", "text",
      col("split"), n = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, c) => id -> ((n, c)) }.toMap
    assert(r == Map(2L -> ((3L, 1L)), 3L -> ((2L, 0L))))
  }

  test("q120 repeated spans: verbatim copies read 100% repeated, uniques 0%") {
    val d = sf()
    val out = queries.CorpusQ.q120.fn(spark, d)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // every doc < 50 has a verbatim twin at +10000: both sides of the
    // pair must be fully covered by repeated windows
    (0L until 50L).filter(out.contains).foreach { id =>
      assert(out(id)._4 == 1.0, s"doc $id not fully repeated")
      assert(out(id + 10000)._4 == 1.0, s"twin of $id not fully repeated")
      assert(out(id)._2 == out(id + 10000)._2, "twin window counts differ")
    }
    // at least one un-copied doc with no coincidental 8-gram repeats
    assert(out.exists { case (id, r) => id >= 50 && id < 10000 &&
      r._3 == 0L && r._4 == 0.0 },
      "no clean unique doc found — fixture degenerate")
  }

  test("q120 plan: one hash-partition window, per-doc agg, no membership join") {
    val p = queries.CorpusQ.q120.fn(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Join"), s"span pass grew a join:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q123 line dedup matches a driver-side brute-force replay") {
    val d = sf()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val boiler = "subscribe to our newsletter for updates " +
      "terms of service apply"
    val raw = Tables.documents(spark, d).filter(col("doc_id") < 150)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> (if (id % 3 == 0) s"$boiler $t" else t) }
      .sortBy(_._1)
    // corpus-wide first occurrence by (doc_id, seg_idx)
    val seen = scala.collection.mutable.Set[String]()
    val want = raw.map { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val segs = toks.grouped(10).map(_.mkString(" ")).toSeq
      val kept = segs.filter(s => seen.add(s))
      (id, segs.size.toLong, kept.size.toLong, md5hex(kept.mkString(" ")))
    }.toSeq
    val got = queries.CorpusQ.q123.fn(spark, d)
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == want)
    // the manufactured semantics actually fired: every headered doc
    // except the first lost exactly its header line
    val headered = got.filter(_._1 % 3 == 0)
    assert(headered.head._2 == headered.head._3,
      "first headered doc must keep everything")
    assert(headered.tail.forall(r => r._3 < r._2),
      "later headered docs must lose the shared header")
  }

  test("packBins assigns documents to fixed token windows greedily") {
    // tokens: 300, 300, 300 -> cumsum 300, 600, 900
    // start offsets 0, 300, 600 -> bins 0, 0, 1 at window=512
    val docs = Seq((1L, "g", 300), (2L, "g", 300), (3L, "g", 300))
      .toDF("doc_id", "grp", "ntok")
    val bins = Corpus.packBins(docs, "grp", "doc_id", col("ntok"), 512)
      .select(col("doc_id"), col("bin"))
      .as[(Long, Long)].collect().toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("packBins streams are independent per group") {
    val docs = Seq((1L, "a", 600), (2L, "b", 600), (3L, "a", 100))
      .toDF("doc_id", "grp", "ntok")
    val bins = Corpus.packBins(docs, "grp", "doc_id", col("ntok"), 512)
      .select(col("doc_id"), col("bin"))
      .as[(Long, Long)].collect().toMap
    // group a: starts 0, 600 -> bins 0, 1; group b: start 0 -> bin 0
    assert(bins == Map(1L -> 0L, 3L -> 1L, 2L -> 0L))
  }

  // ---- crossDocDupSpans (q152) ----------------------------------

  private def toks(prefix: String, from: Int, until: Int): String =
    (from until until).map(i => s"$prefix$i").mkString(" ")

  test("crossDocDupSpans merges shared windows into maximal spans") {
    // A = a0..a29; B embeds A's tokens 5..20 at positions 3..18;
    // C repeats its own 10-gram twice (intra-doc only).
    val docs = Seq(
      (1L, toks("a", 0, 30)),
      (2L, "x0 x1 x2 " + toks("a", 5, 21) + " y0 y1"),
      (3L, toks("r", 0, 10) + " " + toks("r", 0, 10)))
      .toDF("doc_id", "text")
    val spans = Dedup.crossDocDupSpans(docs, "doc_id", "text", n = 10)
      .select(col("doc"), col("m_start"), col("m_end"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    // A: shared windows start 5..11 -> [5, 21); B: start 3..9 -> [3, 19)
    assert(spans == Seq((1L, 5L, 21L), (2L, 3L, 19L)))
  }

  test("crossDocDupSpans keeps separated spans separate") {
    // D borrows A's tokens 0..13 AND 17..30 around unique filler, so
    // A must report two maximal spans with the [13,17) gap intact.
    val docs = Seq(
      (1L, toks("a", 0, 30)),
      (2L, toks("a", 0, 13) + " " + toks("f", 0, 12) + " " +
        toks("a", 17, 30)))
      .toDF("doc_id", "text")
    val byDoc = Dedup.crossDocDupSpans(docs, "doc_id", "text", n = 10)
      .select(col("doc"), col("m_start"), col("m_end"))
      .as[(Long, Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted)
      .toMap
    assert(byDoc(1L) == Seq((0L, 13L), (17L, 30L)))
  }

  // ---- packSequences (q153) -------------------------------------

  test("packSequences splits the concatenated stream exactly") {
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 5L), (4L, 2L), (5L, 6L))
      .toDF("doc_id", "ntok")
    val rows = Corpus.packSequences(docs, lit(0), col("doc_id"),
        "doc_id", col("ntok"), seqLen = 4)
      .select(col("seq"), col("doc_id"), col("seq_tokens"),
        col("starts_here"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    // offsets: d1 [0,3) d2 [3,7) d3 [7,12) d4 [12,14) d5 [14,20)
    assert(rows == Seq(
      (0L, 1L, 3L, 1L), (0L, 2L, 1L, 1L),
      (1L, 2L, 3L, 0L), (1L, 3L, 1L, 1L),
      (2L, 3L, 4L, 0L),
      (3L, 4L, 2L, 1L), (3L, 5L, 2L, 1L),
      (4L, 5L, 4L, 0L)))
  }

  test("packSequences conserves tokens and drops empty docs") {
    val docs = Seq((1L, 7L), (2L, 0L), (3L, 9L)).toDF("doc_id", "ntok")
    val out = Corpus.packSequences(docs, lit(0), col("doc_id"),
      "doc_id", col("ntok"), seqLen = 4)
    assert(out.agg(sum(col("seq_tokens"))).as[Long].head() == 16L)
    assert(out.filter(col("doc_id") === 2L).count() == 0L)
    // every sequence except the last is exactly full
    val fills = out.groupBy(col("seq"))
      .agg(sum(col("seq_tokens")).as("t"))
      .orderBy(col("seq")).as[(Long, Long)].collect().toSeq
    assert(fills.init.forall(_._2 == 4L) && fills.last._2 == 4L)
  }

  test("crossDocDupSpansOwned assigns first occurrence to the lowest doc") {
    // B borrows A's tokens; the shared span's m_first must be A's id
    // in BOTH docs, so a keep-first pass (m_first < doc) cuts only B.
    val docs = Seq(
      (1L, toks("a", 0, 30)),
      (2L, "x0 x1 x2 " + toks("a", 5, 21) + " y0 y1"))
      .toDF("doc_id", "text")
    val spans = graft.operators.Dedup
      .crossDocDupSpansOwned(docs, "doc_id", "text", n = 10)
      .select(col("doc"), col("m_start"), col("m_end"), col("m_first"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(spans == Seq((1L, 5L, 21L, 1L), (2L, 3L, 19L, 1L)))
    val cutDocs = spans.filter(s => s._4 < s._1).map(_._1)
    assert(cutDocs == Seq(2L))
  }

  // ---- temperature mixing / vocab overlap (q154/q155) -----------

  test("temperature mixing flattens the source distribution") {
    // α = 0.5 smoothing must give the low-resource corpus a higher
    // sampling probability than its raw share, the high-resource one
    // a lower, with epochs (oversampling) monotone against size.
    val docs = Seq.tabulate(90)(i => (i.toLong, "big", "w " * 100)) ++
      Seq.tabulate(10)(i => ((i + 90).toLong, "small", "w " * 100))
    val df = docs.toDF("doc_id", "lang", "text")
    val byLang = df.groupBy(col("lang"))
      .agg(sum(graft.operators.TextOps.tokenCount(col("text"))
        .cast("long")).as("tok"))
      .as[(String, Long)].collect().toMap
    assert(byLang("big") == 9000L && byLang("small") == 1000L)
    // smoothed weights: sqrt(0.9)=0.94868…, sqrt(0.1)=0.31622… →
    // p(small) = 0.31622/1.26491 = 0.25 vs raw share 0.10
    val w = math.floor(math.sqrt(0.1) * 1e6) +
      math.floor(math.sqrt(0.9) * 1e6)
    val pSmall = math.floor(math.sqrt(0.1) * 1e6) / w
    assert(pSmall > 0.24 && pSmall < 0.26)
  }

  test("vocab overlap pairs are exact on a hand corpus") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "en", "beta delta"),
      (3L, "fr", "beta gamma epsilon"))
      .toDF("doc_id", "lang", "text")
    val vocab = docs.select(col("lang"),
        explode(array_distinct(
          graft.operators.TextOps.tokens(col("text")))).as("tok"))
      .distinct()
    val inter = vocab.as("a").join(vocab.as("b"), Seq("tok"))
      .filter(col("a.lang") < col("b.lang"))
      .count()
    // en vocab {alpha beta gamma delta}, fr {beta gamma epsilon} →
    // intersection {beta gamma} = 2; jaccard 2/5, containment 2/3
    assert(inter == 2L)
  }

  test("scrubDupSpans: keep-first removal — first occurrence intact, " +
      "borrowers cut, full coverage empties the doc") {
    def words(r: Range) = r.map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(0 to 11)),            // owner: 12 tokens
      (2L, words(0 to 9) + " x y"),    // borrows tokens 0-9, own tail
      (3L, words(0 to 9)))             // fully borrowed
      .toDF("doc_id", "text")
    val out = Dedup.scrubDupSpans(docs, "doc_id", "text", n = 10)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toList
    def md5Of(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // doc 1 (lowest id sharing the windows) keeps everything and is
    // absent; doc 2 keeps only its own tail; doc 3 empties
    assert(out === List(
      (2L, 12L, 2L, 1L, md5Of("x y")),
      (3L, 10L, 0L, 1L, md5Of(""))))
  }
}
