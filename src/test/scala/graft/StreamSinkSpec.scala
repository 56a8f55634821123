package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Exactly-once foreachBatch sink (G12): overwrite-by-batch-id makes
  * the inevitable at-least-once replay window idempotent. */
class StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  test("idempotent sink: replaying a batch id leaves output byte-identical") {
    val outDir = Files.createTempDirectory("graft-sink").toString
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    StreamOps.writeBatchIdempotent(batch, outDir, 7L)
    val first = spark.read.parquet(outDir)
      .orderBy("id").collect().toSeq
    // the replay: same batch id written again (failure-after-write,
    // restart-before-commit) must not duplicate
    StreamOps.writeBatchIdempotent(batch, outDir, 7L)
    val second = spark.read.parquet(outDir)
      .orderBy("id").collect().toSeq
    assert(first == second)
    assert(second.size == 2)
  }

  test("streamed micro-batches land in per-batch partitions, each row exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val outDir = Files.createTempDirectory("graft-sink-out").toString
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.startIdempotentParquetSink(
      in.toDF().toDF("id", "v"), outDir, ckpt)
    in.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    in.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(outDir)
      .select($"id", $"batch_id".cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 3L), s"rows: $rows")
    // batch partitioning surfaced as a readable column
    assert(rows.map(_._2).distinct.size == 2)
  }
}
