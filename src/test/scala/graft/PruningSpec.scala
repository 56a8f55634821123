package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Partition-layout read path: a lang-partitioned parquet sink, then
  * the two pruning modes that make it pay at scale — static pruning
  * (a literal filter on the partition column never touches other
  * partitions' files) and dynamic partition pruning (a selective dim
  * filter prunes fact partitions at runtime through the join). On a
  * 100 TB lang/date-partitioned corpus these are the difference
  * between scanning one partition and scanning the lake. */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, sf())
      .write.mode("overwrite").partitionBy("lang")
      .parquet(s"$d/docs")
    d
  }

  test("partitioned sink lays out one directory per partition value") {
    val langs = new java.io.File(s"$dir/docs").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    assert(langs.length >= 3, s"expected lang=* dirs, got ${langs.toSeq}")
    // read-back round-trips the full row count
    val n = spark.read.parquet(s"$dir/docs").count()
    assert(n == Tables.documents(spark, sf()).count())
  }

  test("static pruning: a literal partition filter reaches PartitionFilters") {
    val p = spark.read.parquet(s"$dir/docs")
      .filter($"lang" === "en").select($"doc_id")
      .queryExecution.explainString(FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(p).isDefined,
      s"partition filter not pushed to the scan:\n$p")
    assert(!p.contains("PushedFilters: [IsNotNull(lang)"),
      s"lang should prune directories, not filter rows:\n$p")
  }

  test("term-bucketed postings: phrase read prunes partitions AND pushes tok") {
    import graft.operators.Postings
    val posts = Postings.positional(
      Tables.documents(spark, sf()).limit(500), "doc_id", "text")
    val buckets = 16
    posts
      .withColumn("term_bucket",
        Postings.termBucket($"tok", buckets))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$dir/postings")
    val stored = spark.read.parquet(s"$dir/postings")

    // a data-derived phrase, read back as literals for the pruned scan
    val Array(w1, w2) = Postings
      .topBigram(Tables.documents(spark, sf()).limit(500), "text")
      .collect().head.toSeq.map(_.toString).toArray
    val pruned = Postings.prunedForPhrase(stored, "term_bucket",
      w1, w2, buckets)
    val p = pruned.queryExecution.explainString(FormattedMode)
    // the foldable termBucket(literal) must land in PartitionFilters —
    // non-phrase buckets' directories are never opened
    assert("PartitionFilters: \\[[^\\]]*term_bucket".r
      .findFirstIn(p).isDefined,
      s"bucket filter did not reach PartitionFilters:\n$p")
    // and the tok predicate must push into the row-group scan
    assert(p.contains("PushedFilters: [In(tok") ||
      p.contains("PushedFilters: [Or(EqualTo(tok"),
      s"tok filter not pushed:\n$p")

    // the pruned read answers the phrase EXACTLY like the full index
    val viaPruned = Postings.phraseHits(pruned, "doc_id",
      Seq((w1, w2)).toDF("w1", "w2"), "w1", "w2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaFull = Postings.phraseHits(posts, "doc_id",
      Seq((w1, w2)).toDF("w1", "w2"), "w1", "w2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPruned === viaFull && viaFull.nonEmpty)
  }

  test("IVF cell-partitioned vector store: the probe join prunes cell partitions") {
    // the q144 scale claim made concrete on storage: vectors written
    // partitioned by their IVF cell; the (q_id, cell) probe relation
    // joins on cell, and dynamic partition pruning restricts the scan
    // to the nprobe probed cells — unprobed cells' files never open
    Tables.embeddings(spark, sf())
      .write.mode("overwrite").partitionBy("label")
      .parquet(s"$dir/vecs")
    val vecs = spark.read.parquet(s"$dir/vecs")
    // probe relation as a real scan (DPP needs Filter-over-scan)
    Seq((0L, 1), (0L, 3), (1L, 2), (1L, 4), (2L, 0))
      .toDF("q_id", "label")
      .write.mode("overwrite").parquet(s"$dir/probes")
    val probes = spark.read.parquet(s"$dir/probes")
    val q = vecs.join(probes.filter($"q_id" === 0L), "label")
      .select($"vec_id")
    val p = q.queryExecution.explainString(FormattedMode)
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"probe join did not dynamically prune cell partitions:\n$p")
    assert(q.count() === Tables.embeddings(spark, sf())
      .filter($"label".isin(1, 3)).count())
  }

  test("dynamic partition pruning fires through a selective dim join") {
    val facts = spark.read.parquet(s"$dir/docs")
    // tiny dim: one row per lang, filtered to a single lang — the
    // classic star-schema shape where the fact partition values are
    // only known at runtime via the join. The dim must be a real
    // scan (not a LocalRelation): the pruning rule only treats a
    // Filter-over-scan as a selective source.
    Seq(("en", "English"), ("fr", "French"), ("de", "German"),
      ("es", "Spanish"), ("zh", "Chinese")).toDF("lang", "name")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val q = facts.join(dim.filter($"name" === "English"), "lang")
      .select($"doc_id")
    val p = q.queryExecution.explainString(FormattedMode)
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"dynamic partition pruning did not fire:\n$p")
    assert(q.count() ==
      Tables.documents(spark, sf()).filter($"lang" === "en").count())
  }

  test("Hilbert-bucketed layout: covering buckets prune partitions, box answer exact") {
    import graft.operators.ZOrder
    val (bits, dims, levels) = (6, 3, 2) // 64-grid, 64 buckets of 16^3 cells
    val d = Files.createTempDirectory("graft-hilbert").toString
    // deterministic point cloud on the 64^3 grid — hashed per axis
    // (linear `id*p % 64` coords are all functions of id mod 64:
    // 64 collinear triples, not a cloud)
    val pts = spark.range(20000).select(
        pmod(xxhash64(col("id"), lit(1)), lit(64)).as("x"),
        pmod(xxhash64(col("id"), lit(2)), lit(64)).as("y"),
        pmod(xxhash64(col("id"), lit(3)), lit(64)).as("w"))
      .withColumn("h", ZOrder.hilbertN(Seq(col("x"), col("y"), col("w")), bits))
      .withColumn("hbucket", expr(s"h div ${1L << (dims * (bits - levels))}"))
    pts.write.mode("overwrite").partitionBy("hbucket").parquet(s"$d/pts")

    val box = Seq((4L, 19L), (8L, 23L), (0L, 15L))
    val buckets = ZOrder.hilbertCoveringBuckets(bits, dims, levels, box)
    // the planner list comes from the CURVE alone - a strict subset
    assert(buckets.nonEmpty && buckets.size < (1 << (dims * levels)),
      s"covering set should prune: ${buckets.size} of 64")

    val boxFilter = col("x").between(box(0)._1, box(0)._2) &&
      col("y").between(box(1)._1, box(1)._2) &&
      col("w").between(box(2)._1, box(2)._2)
    val pruned = spark.read.parquet(s"$d/pts")
      .filter(col("hbucket").isin(buckets: _*) && boxFilter)
    val plan = pruned.queryExecution.explainString(FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*hbucket".r.findFirstIn(plan).isDefined,
      s"bucket list did not reach PartitionFilters:\n$plan")
    // exactness: the residual predicate keeps the answer identical to
    // a full scan - the covering set can over-approximate, never lose
    val full = spark.read.parquet(s"$d/pts").filter(boxFilter)
    assert(pruned.count() == full.count() && full.count() > 0,
      s"pruned ${pruned.count()} vs full ${full.count()}")
  }
}
