package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** The composed streaming corpus ingest (StreamOps.corpusIngest):
  * the q57/q98 curation algebra running incrementally. Verifies the
  * incremental result equals a batch recompute over everything
  * ingested — the merge-algebra claim q98 proves cross-engine,
  * checked here across micro-batch boundaries. */
class StreamCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // long enough to pass the 0.5 quality gate (length term saturating)
  private def doc(tag: String): String =
    (1 to 30).map(i => s"tok$tag$i").mkString(" ")

  test("incremental per-lang stats equal a batch recompute; dups and low-quality dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val docs = in.toDF().toDF("ts", "text", "lang")
    val out = StreamOps.corpusIngest(docs, "ts", "text", "lang",
      watermark = "10 minutes", minQuality = 0.5)
    val q = out.writeStream.format("memory").queryName("ingest")
      .outputMode("update").start()

    in.addData(
      (ts("2024-01-01 00:00:00"), doc("a"), "en"),
      (ts("2024-01-01 00:01:00"), doc("b"), "en"),
      (ts("2024-01-01 00:02:00"), doc("c"), "fr"),
      (ts("2024-01-01 00:02:30"), "the a the a", "fr")) // gated out
    q.processAllAvailable()
    in.addData(
      (ts("2024-01-01 00:03:00"), doc("a"), "en"), // dup of batch 1
      (ts("2024-01-01 00:04:00"), doc("d"), "fr"))
    q.processAllAvailable()
    q.stop()

    // memory sink in update mode keeps every emitted row — take the
    // latest row per lang
    val got = spark.table("ingest")
      .groupBy($"lang")
      .agg(max(struct($"n_docs", $"sum_tokens", $"sum_qm")).as("m"))
      .select($"lang", $"m.n_docs", $"m.sum_tokens", $"m.sum_qm")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // batch recompute over the distinct surviving docs
    val batch = Seq((doc("a"), "en"), (doc("b"), "en"),
      (doc("c"), "fr"), (doc("d"), "fr"))
      .toDF("text", "lang")
      .withColumn("__q", graft.operators.TextOps
        .qualityScore($"text", Seq("the", "a")))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum(graft.operators.TextOps.tokenCount($"text").cast("long"))
          .as("t"),
        sum(floor($"__q" * 1e6 + 0.5)).as("qm"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(got == batch, s"incremental $got vs batch $batch")
    assert(got("en")._1 == 2L) // the duplicate did not double-count
  }

  test("model-gated ingest equals batch scoreDocs gate over the union of micro-batches") {
    import graft.operators.TextClassifier
    implicit val sqlCtx = spark.sqlContext
    val B = 256
    // offline training (the CCNet shape: train once, publish weights)
    val labeled = Seq(
      ("the quick brown fox jumps over the lazy dog", true),
      ("a clean well formed english sentence appears here", true),
      ("click here buy now free offer click here buy now", false),
      ("zzz qqq xxx www spam spam spam link link link", false))
    val train = labeled.zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "y")
    val weights = TextClassifier.nbLogOddsWeights(train, "doc_id",
      "text", "y", B)
    val wMap = TextClassifier.collectWeights(weights)

    // corpus: english-like docs (model keeps), spam (model drops),
    // a cross-micro-batch duplicate (dedup drops), a 1-token doc
    // (no features — no verdict, dropped at the gate)
    def good(tag: String): String =
      (s"the quick brown fox jumps over the lazy dog and " +
        s"a clean well formed english sentence appears here $tag")
    val spam = "click here buy now free offer spam link " * 4
    val batch1 = Seq(
      (ts("2024-01-01 00:00:00"), good("alpha"), "en"),
      (ts("2024-01-01 00:01:00"), good("beta"), "en"),
      (ts("2024-01-01 00:02:00"), spam, "en"),
      (ts("2024-01-01 00:02:30"), "solo", "fr"))
    val batch2 = Seq(
      (ts("2024-01-01 00:03:00"), good("alpha"), "en"), // dup
      (ts("2024-01-01 00:04:00"), good("gamma"), "fr"))

    val in = MemoryStream[(Timestamp, String, String)]
    val docs = in.toDF().toDF("ts", "text", "lang")
    val out = StreamOps.corpusIngest(docs, "ts", "text", "lang",
      watermark = "10 minutes", minQuality = 0.0,
      modelWeights = Some(wMap), modelBuckets = B)
    val q = out.writeStream.format("memory").queryName("model_ingest")
      .outputMode("update").start()
    in.addData(batch1: _*); q.processAllAvailable()
    in.addData(batch2: _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("model_ingest")
      .groupBy($"lang")
      .agg(max(struct($"n_docs", $"sum_tokens", $"sum_qm")).as("m"))
      .select($"lang", $"m.n_docs", $"m.sum_tokens", $"m.sum_qm")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // batch recompute over the UNION of micro-batches: scoreDocs
    // keep-gate → exact text dedup → per-lang stats
    val union = (batch1 ++ batch2).zipWithIndex
      .map { case ((_, t, l), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "lang")
    val kept = TextClassifier.scoreDocs(union, "doc_id", "text",
        weights, B)
      .filter(col("keep")).select(col("doc_id"))
    val expected = union.join(kept, Seq("doc_id"), "left_semi")
      .dropDuplicates("text")
      .withColumn("__q", graft.operators.TextOps
        .qualityScore($"text", Seq("the", "a")))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum(graft.operators.TextOps.tokenCount($"text").cast("long"))
          .as("t"),
        sum(floor($"__q" * 1e6 + 0.5)).as("qm"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(got == expected, s"stream $got vs batch $expected")
    // the gate actually fired: spam and the no-feature doc are gone,
    // the duplicate counted once
    assert(got("en")._1 == 2L && got("fr")._1 == 1L)
  }

  test("streaming media ingest: per-format totals equal batch; dups dropped") {
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val png = Multimodal.synthPng(64, 48)
    val wav = Multimodal.synthWav(8000, 1, 16, 100)
    val jpeg = Multimodal.synthJpeg(32, 24)
    val mp4 = Multimodal.synthMp4("isom", 1000, 5000L, 2)
    val junk = "not media at all".getBytes("UTF-8")

    val in = MemoryStream[(Timestamp, Array[Byte])]
    val out = StreamOps.mediaIngest(in.toDF().toDF("ts", "payload"),
      "ts", "payload", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("mingest")
      .outputMode("update").start()

    in.addData(
      (ts("2024-01-01 00:00:00"), png),
      (ts("2024-01-01 00:01:00"), wav),
      (ts("2024-01-01 00:02:00"), junk))
    q.processAllAvailable()
    in.addData(
      (ts("2024-01-01 00:03:00"), png), // exact re-delivery: dropped
      (ts("2024-01-01 00:04:00"), jpeg),
      (ts("2024-01-01 00:05:00"), mp4))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("mingest")
      .groupBy($"format")
      .agg(max(struct($"n", $"total_bytes")).as("m"))
      .select($"format", $"m.n", $"m.total_bytes")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "png" -> ((1L, png.length.toLong)),
      "wav" -> ((1L, wav.length.toLong)),
      "jpeg" -> ((1L, jpeg.length.toLong)),
      "mp4" -> ((1L, mp4.length.toLong)),
      "unknown" -> ((1L, junk.length.toLong))), got.toString)
  }

  test("streaming VARIANT ingest equals the batch aggregate across " +
      "micro-batch boundaries (q124's parse path per trigger)") {
    implicit val sqlCtx = spark.sqlContext
    // same payload construction as q124: meta object + integer array,
    // built with to_json(struct(...)) so escaping/null semantics are
    // the batch query's exactly
    def payload(df: org.apache.spark.sql.DataFrame) =
      df.select(to_json(struct(
        struct($"event_type".as("type"), $"user_id".as("uid")).as("meta"),
        array($"k", $"k" + 1).as("ks"))).as("payload"))

    val in = MemoryStream[(String, Long, Long)]
    val out = StreamOps.variantIngest(
      payload(in.toDF().toDF("event_type", "user_id", "k")), "payload")
    val q = out.writeStream.format("memory").queryName("vingest")
      .outputMode("complete").start()
    val b1 = Seq(("click", 10L, 5L), ("view", 20L, 7L), ("click", 30L, 9L))
    val b2 = Seq(("view", 5L, 1L), ("click", 2L, 3L), ("signup", 100L, 50L))
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("vingest")
      .as[(String, Long, Long, Long)].collect().toSet
    // batch recompute: the SAME operator over the union of both
    // micro-batches (variantIngest is plain DataFrame algebra, so it
    // runs unchanged in batch) — cross-batch merge must be exact
    val want = StreamOps.variantIngest(
        payload((b1 ++ b2).toDF("event_type", "user_id", "k")), "payload")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want, s"stream $got vs batch $want")
    // hand-pinned: clicks (10,5)(30,9)(2,3) -> n=3, uid=42, k2=20
    assert(got.contains(("click", 3L, 42L, 20L)), got)
    assert(got.size == 3)
  }

  test("streaming near-dup admission: a near-dup in a LATER micro-batch " +
      "is rejected against the index; state stays watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("neardup").toString
    val indexDir = s"$dir/index"
    val ckpt = s"$dir/ckpt"

    // base doc: 30 tokens; near: ONE token edited (shingle Jaccard
    // well above 0.7); far: unrelated tokens
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (1 to 30).map(i => if (i == 15) "EDIT" else s"w$i")
      .mkString(" ")
    val far = (1 to 30).map(i => s"z$i").mkString(" ")

    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamOps.startNearDupAdmission(
      in.toDF().toDF("ts", "doc_id", "text"),
      "ts", "doc_id", "text", watermark = "10 minutes",
      indexDir = indexDir, checkpointDir = ckpt,
      n = 3, k = 8, bands = 4, minJaccard = 0.7)

    in.addData((ts("2024-01-01 00:00:00"), 1L, base))
    q.processAllAvailable()
    in.addData(
      (ts("2024-01-01 00:01:00"), 2L, near),  // near-dup of batch-1 doc
      (ts("2024-01-01 00:02:00"), 3L, far),   // genuinely new
      (ts("2024-01-01 00:03:00"), 4L, base))  // exact replay of doc 1
    q.processAllAvailable()
    // intra-batch near-dup: 6 arrives with 5 in ONE batch — first
    // (lower id) wins
    val v = (1 to 30).map(i => s"v$i").mkString(" ")
    val vNear = (1 to 30).map(i => if (i == 7) "X" else s"v$i")
      .mkString(" ")
    in.addData(
      (ts("2024-01-01 00:04:00"), 5L, v),
      (ts("2024-01-01 00:05:00"), 6L, vNear))
    q.processAllAvailable()
    // the only streaming STATE is the exact-hash watermark dedup —
    // near-dup memory lives in the index table, which is why state
    // cannot grow past the horizon
    val progress = q.lastProgress
    q.stop()

    val admitted = spark.read.parquet(indexDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L, 5L),
      s"admitted $admitted — expected near-dup 2, exact replay 4, " +
        "and intra-batch near-dup 6 all rejected")
    assert(progress.stateOperators.nonEmpty &&
      progress.stateOperators.head.operatorName
        .contains("dedupeWithinWatermark"),
      "exact dedup state operator missing from the streaming plan")
  }

  test("streaming MEDIA admission: near-dup image/audio in later batches " +
      "rejected per modality against the hash index") {
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("media_admit").toString
    val (indexDir, ckpt) = (s"$dir/index", s"$dir/ckpt")

    def png(v: Int): Array[Byte] =
      Multimodal.synthPngGray(32, 28, (x, y) =>
        (x * 151 + y * 211 + v * ((x + y) % 2)) % 256)
    def wav(edit: Boolean): Array[Byte] =
      Multimodal.synthWavPcm(8000, Array.tabulate(65 * 256) { i =>
        val f = i / 256
        val a = if (edit && f == 20) 4 else (f * 7 % 13) + 1
        a * (if (i % 2 == 0) 1 else -1)
      })
    def far: Array[Byte] =
      Multimodal.synthPngGray(32, 28, (x, y) => (x * 31 + y * 97) % 256)

    val in = MemoryStream[(Timestamp, Long, Array[Byte])]
    val q = StreamOps.startMediaAdmission(
      in.toDF().toDF("ts", "media_id", "payload"),
      "ts", "media_id", "payload", watermark = "10 minutes",
      indexDir = indexDir, checkpointDir = ckpt, maxHamming = 12)

    in.addData(
      (ts("2024-01-01 00:00:00"), 1L, png(0)),
      (ts("2024-01-01 00:00:30"), 2L, wav(false)))
    q.processAllAvailable()
    in.addData(
      (ts("2024-01-01 00:01:00"), 3L, png(2)),      // near-dup of 1
      (ts("2024-01-01 00:02:00"), 4L, wav(true)),   // near-dup of 2
      (ts("2024-01-01 00:03:00"), 5L, png(0)),      // exact replay of 1
      (ts("2024-01-01 00:04:00"), 6L, far))         // genuinely new
    q.processAllAvailable()
    q.stop()

    val admitted = spark.read.parquet(indexDir)
      .select($"media_id", $"kind").as[(Long, String)].collect().toSet
    assert(admitted == Set((1L, "image"), (2L, "audio"), (6L, "image")),
      s"media admission wrong: $admitted")
    // the index holds 16-byte hashes, never payloads
    assert(!spark.read.parquet(indexDir).columns.contains("payload"))
  }

  test("admission index compaction: fewer files, identical content, " +
      "identical admission decisions") {
    val dir = java.nio.file.Files
      .createTempDirectory("neardup_compact").toString
    val indexDir = s"$dir/index"
    def doc(tag: String, edit: Int => String = null) =
      (1 to 30).map(i =>
        if (edit != null && i == 9) edit(i) else s"$tag$i")
        .mkString(" ")
    // five single-doc admissions -> five small parquet appends
    (1 to 5).foreach { i =>
      StreamOps.admitNearDupBatch(
        Seq((i.toLong, doc(s"t${i}_"))).toDF("doc_id", "text"),
        "doc_id", "text", indexDir, n = 3, k = 8, bands = 4,
        minJaccard = 0.7)
    }
    val before = spark.read.parquet(indexDir)
      .as[(Long, String)].collect().toSet
    val filesBefore = new java.io.File(indexDir)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesBefore >= 5, s"expected >=5 small files, $filesBefore")

    val stats = StreamOps.compactAdmissionIndex(spark, indexDir,
      targetBytes = 1L << 30)
    assert(stats.after == 1 && stats.before == filesBefore)
    val after = spark.read.parquet(indexDir)
      .as[(Long, String)].collect().toSet
    assert(after == before, "compaction changed index content")

    // a near-dup of a PRE-compaction doc must still be rejected, and
    // a genuinely new doc admitted, through the compacted index
    val admitted = StreamOps.admitNearDupBatch(
      Seq((100L, doc("t3_", _ => "EDIT")),   // near-dup of doc 3
        (101L, doc("fresh_"))).toDF("doc_id", "text"),
      "doc_id", "text", indexDir, n = 3, k = 8, bands = 4,
      minJaccard = 0.7)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(admitted == Set(101L),
      s"post-compaction admission wrong: $admitted")
  }

  test("packSequencesStream carries shard offsets across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, Long, Long)] // (shard, doc_id, ntok)
    val out = StreamOps.packSequencesStream(in.toDS(), seqLen = 4L)
    val q = out.writeStream.format("memory").queryName("pack")
      .outputMode("append").start()

    // the CorpusSpec batch example split across two triggers, plus
    // an empty doc that must vanish and a second shard interleaved
    in.addData((0, 1L, 3L), (0, 2L, 4L), (0, 3L, 5L), (1, 10L, 6L))
    q.processAllAvailable()
    in.addData((0, 4L, 2L), (0, 99L, 0L), (0, 5L, 6L), (1, 11L, 3L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("pack")
      .as[StreamOps.PackedDoc].collect()
      .map(p => (p.shard, p.docId) ->
        ((p.tokStart, p.tokEnd, p.seqFirst, p.seqLast))).toMap
    // shard 0 offsets continue 12 -> 14 -> 20 across the boundary,
    // matching the batch packSequences example exactly
    assert(got((0, 1L)) == ((0L, 3L, 0L, 0L)))
    assert(got((0, 2L)) == ((3L, 7L, 0L, 1L)))
    assert(got((0, 3L)) == ((7L, 12L, 1L, 2L)))
    assert(got((0, 4L)) == ((12L, 14L, 3L, 3L)))
    assert(got((0, 5L)) == ((14L, 20L, 3L, 4L)))
    // shard 1 packs independently; empty doc 99 emitted nothing
    assert(got((1, 10L)) == ((0L, 6L, 0L, 1L)))
    assert(got((1, 11L)) == ((6L, 9L, 1L, 2L)))
    assert(!got.contains((0, 99L)))

    // the streamed ranges equal the batch operator fed in the same
    // per-shard order (doc_id order here)
    val batch = graft.operators.Corpus.packSequences(
        Seq((0, 1L, 3L), (0, 2L, 4L), (0, 3L, 5L), (0, 4L, 2L),
          (0, 99L, 0L), (0, 5L, 6L), (1, 10L, 6L), (1, 11L, 3L))
          .toDF("shard", "doc_id", "ntok"),
        col("shard"), col("doc_id"), "doc_id", col("ntok"), 4)
      .select($"shard", $"doc_id", $"tok_start", $"tok_end")
      .distinct()
      .as[(Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    batch.foreach { case (k, (s, e)) =>
      assert(got(k)._1 == s && got(k)._2 == e,
        s"stream/batch offset mismatch for $k")
    }
  }
}
