package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Independent verification of the retrieval/training-prep artifacts:
  * q102's inverted-index fingerprints re-derived with plain Scala
  * tokenization, and q104's epoch-shuffle manifest checked against
  * the REAL writer path (repartition by shard + sortWithinPartitions
  * — the files a training run would read must match the manifest).
  */
class ShardIndexSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("q102 posting lists match a driver-side re-tokenization") {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val postings = docs
      .flatMap { case (id, t) =>
        t.split("\\s+").filter(_.nonEmpty).map(tok => (tok, id)) }
      .groupBy(_._1)
    val got = queries.Text.q102.fn(spark, d).collect()
    assert(got.length == postings.size)
    got.foreach { r =>
      val (tok, df, cf, first, last, fp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
      val ids = postings(tok).map(_._2)
      val distinct = ids.distinct.sorted
      assert(df == distinct.length.toLong, s"df($tok)")
      assert(cf == ids.length.toLong, s"cf($tok)")
      assert(first == distinct.head && last == distinct.last, s"range($tok)")
      assert(fp == md5hex(distinct.mkString(",")), s"postings_md5($tok)")
    }
  }

  test("q102 is ordered by df desc, token asc (a real index's key order)") {
    val keys = queries.Text.q102.fn(spark, d)
      .select(col("df"), col("tok")).collect()
      .map(r => (-r.getLong(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted))
  }

  test("q104 manifest matches the files the real shard writer produces") {
    val manifest = queries.CorpusQ.q104.fn(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap

    val out = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    val sharded = Tables.documents(spark, d)
      .select(col("doc_id"),
        (operators.Splits.hashBucket(col("doc_id")) % 8).cast("long")
          .as("shard"),
        md5(concat(lit("epoch0:"), col("doc_id").cast("string")))
          .as("ord"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col("doc_id"))
    sharded.write.partitionBy("shard").parquet(s"$out/docs")

    (0L until 8L).foreach { sh =>
      // One writer task owns each shard (repartition on shard), so the
      // shard directory holds exactly one file whose row order is the
      // sortWithinPartitions order.
      val files = new java.io.File(s"$out/docs/shard=$sh")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $sh files")
      val ids = spark.read.parquet(files.head.getPath)
        .select(col("doc_id")).collect().map(_.getLong(0))
      val (nDocs, orderMd5) = manifest(sh)
      assert(ids.length.toLong == nDocs, s"shard $sh count")
      assert(md5hex(ids.mkString(",")) == orderMd5, s"shard $sh order")
    }
  }

  test("q104 epoch salt re-deals the order but not the membership") {
    val e0 = Tables.documents(spark, d)
      .select(col("doc_id"),
        md5(concat(lit("epoch0:"), col("doc_id").cast("string")))
          .as("ord"))
      .orderBy(col("ord")).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val e1 = Tables.documents(spark, d)
      .select(col("doc_id"),
        md5(concat(lit("epoch1:"), col("doc_id").cast("string")))
          .as("ord"))
      .orderBy(col("ord")).select(col("doc_id"))
      .collect().map(_.getLong(0))
    assert(e0.sorted.sameElements(e1.sorted))
    assert(!e0.sameElements(e1))
  }

  // ---- rendezvous hashing (q217) ----

  /** Driver-side HRW reference: argmax over md5(id:shard) with the
    * shard-digit tie-break, same algebra as Splits.hrwAssign. */
  private def hrwRef(id: Long, n: Int): Int =
    (0 until n).map(sh => (md5hex(s"$id:$sh") + sh, sh)).max._2

  test("hrwAssign matches a driver-side md5 argmax") {
    import spark.implicits._
    val got = spark.range(0, 500).toDF("id")
      .select(col("id"),
        graft.operators.Splits.hrwAssign(col("id"), 8).as("a"))
      .as[(Long, Int)].collect().toMap
    (0L until 500L).foreach(i => assert(got(i) === hrwRef(i, 8)))
  }

  test("hrwAssign minimal reshuffle: only the removed shard's rows move") {
    import spark.implicits._
    val moved = spark.range(0, 2000).toDF("id")
      .select(graft.operators.Splits.hrwAssign(col("id"), 8).as("a8"),
        graft.operators.Splits.hrwAssign(col("id"), 7).as("a7"))
      .filter(col("a8") =!= col("a7"))
      .as[(Int, Int)].collect()
    assert(moved.nonEmpty)
    assert(moved.forall(_._1 == 7))
  }

  test("hrwAssign spreads roughly uniformly") {
    import spark.implicits._
    val counts = spark.range(0, 8000).toDF("id")
      .groupBy(graft.operators.Splits.hrwAssign(col("id"), 8).as("a"))
      .count().as[(Int, Long)].collect().toMap
    assert(counts.keySet === (0 until 8).toSet)
    // 8000 over 8 shards: each within 20% of 1000
    counts.values.foreach(c => assert(c > 800 && c < 1200, c))
  }

  // ---- temperatureQuotas (q226) ----

  import spark.implicits._

  private def quotas(cs: Seq[(String, Long)], n: Long, a: Double)
      : Map[String, Long] =
    graft.operators.Splits.temperatureQuotas(
        cs.toDF("src", "c"), "src", "c", n, a)
      .select($"key", $"quota").as[(String, Long)].collect().toMap

  test("temperatureQuotas: quotas always sum to n exactly") {
    val cs = Seq(("a", 1L), ("b", 7L), ("c", 13L), ("d", 997L))
    for (a <- Seq(0.0, 0.5, 1.0); n <- Seq(0L, 1L, 10L, 999L))
      assert(quotas(cs, n, a).values.sum === n, s"alpha=$a n=$n")
  }

  test("temperatureQuotas: alpha interpolates uniform <-> " +
      "proportional, sqrt upweights small sources") {
    val cs = Seq(("small", 100L), ("big", 10000L))
    // proportional: 100:10000 -> ~10 of 1010... use n=101
    assert(quotas(cs, 101L, 1.0) === Map("small" -> 1L, "big" -> 100L))
    // uniform: split evenly regardless of counts
    assert(quotas(cs, 100L, 0.0) === Map("small" -> 50L, "big" -> 50L))
    // sqrt: weights 10:100 -> small gets ~10x its proportional share
    val sq = quotas(cs, 110L, 0.5)
    assert(sq("small") === 10L && sq("big") === 100L, sq.toString)
  }

  test("temperatureQuotas: largest remainder wins the leftover seat, " +
      "ties break to the smaller key") {
    // n=10 over counts 1,1,1 (uniform weights): 3*3=9 floor seats,
    // 1 leftover -> equal remainders, key order gives it to 'a'
    val q = quotas(Seq(("b", 5L), ("a", 5L), ("c", 5L)), 10L, 0.0)
    assert(q === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
  }

  test("temperatureQuotas rejects unsupported alpha") {
    intercept[IllegalArgumentException] {
      quotas(Seq(("a", 1L)), 10L, 0.7)
    }
  }
}
