package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup, Splits, TextOps}

/** End-to-end library composition: the full training-data stack a
  * user would actually run — curate (quality gate + exact + LSH
  * near-dup with best-quality survivors) → deterministic epoch
  * shard write → inverted index over the survivors — with the
  * cross-stage invariants asserted between every pair of stages.
  * Each stage is individually oracled (q96, q104, q102); this spec
  * proves they compose: the index only posts surviving docs, the
  * shards partition exactly the curated set, and re-running the
  * near-dup detector over the curated output finds NOTHING left.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("curate → shard → index composes with cross-stage invariants") {
    val docs = Tables.documents(spark, sf()).filter(col("doc_id") < 150)
      .select(col("doc_id"), col("text"))
    // plant near-dups so curation has real work (q96's fixture shape)
    val corpus = docs.unionByName(docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" pad0")).as("text")))

    // stage 1: curate with best-quality survivors
    val curated = Curate.curate(corpus, "doc_id", "text",
        minQuality = 0.0, minJaccard = 0.9,
        policy = Curate.NearDupPolicy.TransitiveBestQuality)
      .cache()
    val nCurated = curated.count()
    assert(nCurated > 0 && nCurated < corpus.count(),
      "curation must drop the planted dups but keep survivors")

    // invariant 1: the curated corpus is near-dup-free at the same
    // threshold the pipeline enforced
    val leftover = Dedup.lshNearDupPairs(curated, "id", "clean",
      n = 3, k = 6, bands = 3, minJaccard = 0.9)
    assert(leftover.count() == 0,
      "near-dup pairs survived curation")

    // stage 2: deterministic epoch shard write (q104's writer path)
    val dir = Files.createTempDirectory("graft-e2e").toString
    val sharded = curated.select(col("id"), col("clean"),
      (Splits.hashBucket(col("id")) % 4).cast("long").as("shard"),
      md5(concat(lit("epoch0:"), col("id").cast("string"))).as("ord"))
    sharded.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
      .write.partitionBy("shard").mode("overwrite")
      .parquet(s"$dir/shards")
    val readBack = spark.read.parquet(s"$dir/shards")

    // invariant 2: shards partition EXACTLY the curated id set
    assert(readBack.count() == nCurated)
    assert(readBack.select("id").distinct().count() == nCurated)
    assert(readBack.join(curated.select("id"), Seq("id"), "left_anti")
      .count() == 0)

    // stage 3: inverted index over the survivors (q102's shape)
    val postings = curated
      .select(col("id"), explode(TextOps.tokens(col("clean"))).as("tok"))
      .groupBy(col("tok"), col("id")).agg(count(lit(1)).as("tf"))
    val index = postings.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      .cache()

    // invariant 3: the index posts only surviving docs, df is
    // bounded by the corpus size, and cf >= df everywhere
    assert(postings.join(curated.select("id"), Seq("id"), "left_anti")
      .count() == 0, "index posts a curated-away doc")
    val bad = index.filter(col("df") > nCurated ||
      col("cf") < col("df")).count()
    assert(bad == 0, "df/cf algebra violated")

    // invariant 4: same salt reproduces the same shard order;
    // a different salt re-deals order but not membership
    val ord2 = curated.select(col("id"),
      md5(concat(lit("epoch1:"), col("id").cast("string"))).as("ord"))
    val sameMembership = sharded.select("id").except(ord2.select("id"))
    assert(sameMembership.count() == 0)

    curated.unpersist(); index.unpersist()
  }

  test("driver flagship entry returns rows (smoke of the contract)") {
    // the driver smoke-checks rows > 0 on SparkEntry.entry at
    // sf0.001; keep the same check standing in the suite so a
    // refactor can't break the one entry point the driver calls
    // before any oracle runs
    val out = SparkEntry.entry(spark)
    assert(out.columns.toSeq ===
      Seq("r_name", "o_orderpriority", "revenue", "n_items"))
    assert(out.count() > 0)
  }
}
