package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog
import graft.streaming.StreamOps

/** The catalog change feed as a stream
  * ([[StreamOps.replayTableChanges]] /
  * [[StreamOps.startTableChangesFeed]]): ordered per-commit deltas,
  * exactly once across a restart (durable high-water mark), with the
  * concatenation of streamed feeds equal to the batch
  * `tableChanges(v0, vN)` window, and sequential application of the
  * feeds onto the base pin reproducing the final pin even when a key
  * churns across commits — the incremental-retraining consumption
  * contract for a dataset pin. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def registerCatalog(name: String, dir: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.path", dir)
  }

  private def collectSink(
      buf: java.util.concurrent.CopyOnWriteArrayList[
        (Long, Set[(Long, String, String)])])
      : (DataFrame, Long) => Unit =
    (delta, v) => buf.add((v,
      delta.select(col("k"), col("v"), col("_change_type"))
        .as[(Long, String, String)].collect().toSet))

  test("streamed concatenation of per-commit feeds equals batch " +
      "tableChanges(v0, vN) across a restart; each commit delivered " +
      "exactly once, in order") {
    val dir = Files.createTempDirectory("graft-cf").toString
    val ckpt = Files.createTempDirectory("graft-cf-ck").toString
    registerCatalog("gcf", dir)
    spark.sql("CREATE TABLE gcf.t (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO gcf.t VALUES (1,'a'), (2,'a'), (3,'a')") // v0
    // v1: update k2, insert k4 (k1/k3 untouched)
    spark.sql("INSERT OVERWRITE gcf.t VALUES " +
      "(1,'a'), (2,'B'), (3,'a'), (4,'a')")
    val buf = new java.util.concurrent.CopyOnWriteArrayList[
      (Long, Set[(Long, String, String)])]()
    val sink = collectSink(buf)
    // first replay: adopts v0 as the base pin, delivers v1's delta
    assert(StreamOps.replayTableChanges(
      spark, "gcf", "t", Seq("k"), ckpt)(sink) === 1L)
    assert(buf.size === 1 && buf.get(0)._1 === 1L)
    // nothing new → nothing redelivered (idempotent poll)
    assert(StreamOps.replayTableChanges(
      spark, "gcf", "t", Seq("k"), ckpt)(sink) === 1L)
    assert(buf.size === 1)
    // v2: delete k1, insert k5 (no key touched twice in the window)
    spark.sql("INSERT OVERWRITE gcf.t VALUES " +
      "(2,'B'), (3,'a'), (4,'a'), (5,'a')")
    // RESTART: a fresh replay call holds no state beyond the
    // checkpoint file — it must resume at v2, not redeliver v1
    assert(StreamOps.replayTableChanges(
      spark, "gcf", "t", Seq("k"), ckpt)(sink) === 2L)
    import scala.jdk.CollectionConverters._
    val feeds = buf.asScala.toList
    assert(feeds.map(_._1) === List(1L, 2L), "commit order")
    // concatenation of streamed feeds == the batch window
    val streamed = feeds.flatMap(_._2).toSet
    val batch = GraftCatalog
      .tableChanges(spark, "gcf", "t", Seq("k"), 0L, 2L)
      .select(col("k"), col("v"), col("_change_type"))
      .as[(Long, String, String)].collect().toSet
    assert(streamed === batch)
    assert(streamed === Set(
      (2L, "B", "update"), (4L, "a", "insert"),
      (1L, "a", "delete"), (5L, "a", "insert")))
    spark.sql("DROP TABLE gcf.t")
  }

  test("sequentially applying the streamed feeds onto the base pin " +
      "reproduces the final pin even when keys churn across commits") {
    val dir = Files.createTempDirectory("graft-cf2").toString
    val ckpt = Files.createTempDirectory("graft-cf2-ck").toString
    registerCatalog("gcf2", dir)
    spark.sql("CREATE TABLE gcf2.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gcf2.t VALUES (1,'a'), (2,'a')")  // v0
    // k2 updated twice, k4 inserted then deleted, k5 late insert
    spark.sql(
      "INSERT OVERWRITE gcf2.t VALUES (1,'a'), (2,'b'), (4,'x')")
    spark.sql(
      "INSERT OVERWRITE gcf2.t VALUES (1,'a'), (2,'c'), (5,'y')")
    val deltas = new java.util.concurrent.CopyOnWriteArrayList[
      DataFrame]()
    StreamOps.replayTableChanges(spark, "gcf2", "t", Seq("k"), ckpt)(
      (delta, _) => deltas.add(delta.localCheckpoint(true)))
    import scala.jdk.CollectionConverters._
    var state = spark.sql("SELECT * FROM gcf2.t VERSION AS OF 0")
    deltas.asScala.foreach { d =>
      state = state.join(d.select("k"), Seq("k"), "left_anti")
        .unionByName(d.filter(col("_change_type") =!= "delete")
          .select("k", "v"))
    }
    val want = spark.table("gcf2.t")
      .as[(Long, String)].collect().toSet
    assert(state.as[(Long, String)].collect().toSet === want)
    assert(want === Set((1L, "a"), (2L, "c"), (5L, "y")))
    spark.sql("DROP TABLE gcf2.t")
  }

  test("startTableChangesFeed delivers new commits on a trigger") {
    val dir = Files.createTempDirectory("graft-cf3").toString
    val ckpt = Files.createTempDirectory("graft-cf3-ck").toString
    registerCatalog("gcf3", dir)
    spark.sql("CREATE TABLE gcf3.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gcf3.t VALUES (1,'a')")            // v0
    val buf = new java.util.concurrent.CopyOnWriteArrayList[
      (Long, Set[(Long, String, String)])]()
    val q = StreamOps.startTableChangesFeed(spark, "gcf3", "t",
      Seq("k"), ckpt, triggerInterval = "100 milliseconds")(
      collectSink(buf))
    try {
      spark.sql("INSERT INTO gcf3.t VALUES (2,'b')")          // v1
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (buf.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(buf.size >= 1, "feed never delivered v1")
      assert(buf.get(0)._1 === 1L)
      assert(buf.get(0)._2 === Set((2L, "b", "insert")))
    } finally q.stop()
    spark.sql("DROP TABLE gcf3.t")
  }
}
