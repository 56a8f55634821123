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
}
