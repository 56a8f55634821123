package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** Small-files compaction: a 40-file directory rewrites to a handful
  * of right-sized files with exact content fidelity. */
class CompactionSpec extends SparkSpec {

  test("compaction collapses a 40-file directory, preserving content") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val src = Tables.documents(spark, sf())
    src.repartition(40).write.parquet(s"$dir/small")

    val stats = Compaction.compactParquet(spark,
      s"$dir/small", s"$dir/big",
      // quarter of the input bytes -> ~4-5 output files
      targetBytes = new java.io.File(s"$dir/small").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum / 4)

    assert(stats.before == 40, s"$stats")
    assert(stats.after < 10 && stats.after >= 4, s"$stats")
    // content fidelity: same rows, same values
    def fp(p: String) = spark.read.parquet(p)
      .agg(count(lit(1)), sum(col("doc_id")),
        sum(crc32(concat_ws("", col("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))))
      .head().toSeq
    assert(fp(s"$dir/big") == fp(s"$dir/small"))
  }

  test("partitioned (non-leaf) input is rejected, not silently collapsed") {
    val dir = Files.createTempDirectory("graft-compactp").toString
    Tables.documents(spark, sf())
      .write.partitionBy("lang").parquet(s"$dir/small")
    val e = intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, s"$dir/small", s"$dir/big",
        targetBytes = 1L << 20)
    }
    assert(e.getMessage.contains("leaf partition directories"))
  }

  test("absurd output-file counts are rejected before any work") {
    val dir = Files.createTempDirectory("graft-compactn").toString
    Tables.documents(spark, sf()).write.parquet(s"$dir/small")
    val e = intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, s"$dir/small", s"$dir/big",
        targetBytes = 1L, maxOutputFiles = 100L) // one byte per file
    }
    assert(e.getMessage.contains("raise targetBytes"))
  }

  test("tiny input still produces at least one file") {
    val dir = Files.createTempDirectory("graft-compact1").toString
    Tables.region(spark, sf()).write.parquet(s"$dir/small")
    val stats = Compaction.compactParquet(spark,
      s"$dir/small", s"$dir/big", targetBytes = 1L << 30)
    assert(stats.after == 1, s"$stats")
    assert(spark.read.parquet(s"$dir/big").count() ==
      Tables.region(spark, sf()).count())
  }
}
