package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Cdc
import graft.streaming.StreamOps

/** Parquet-persisted [[graft.sources.GraftCatalog]] tables and the
  * declarative streaming upsert sink built on them.
  *
  * The catalog's `path` option turns every committed write into a
  * two-rename-swapped parquet snapshot; a FRESH catalog instance
  * over the same path (the restart) must reconstruct each table
  * from disk, and the on-disk snapshot itself must read back as the
  * table. [[StreamOps.startMergeUpsert]] must equal
  * [[Cdc.mergeLatest]] over the union of all micro-batches — across
  * a stop/restart from the checkpoint — and replaying a batch must
  * be a no-op (the seq-guarded MERGE).
  */
class PersistedCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def registerCatalog(name: String, dir: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.path", dir)
  }

  private def tableDir(root: String, table: String): String = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala
      .find(p => p.getFileName.toString == "schema.json" &&
        p.getParent.getFileName.toString == table)
      .map(_.getParent.toString)
      .getOrElse(fail(s"no persisted dir for $table under $root"))
  }

  test("persisted MERGE INTO: snapshots land on disk and a fresh " +
      "catalog instance reloads them (restart)") {
    val dir = Files.createTempDirectory("graft-cat").toString
    registerCatalog("gp", dir)
    spark.sql("CREATE TABLE gp.t (id BIGINT, v STRING, seq BIGINT)")
    spark.sql("INSERT INTO gp.t VALUES (1,'one',10), (2,'two',10), " +
      "(3,'three',10)")
    Seq((1L, "ONE", 20L, "U"), (2L, "", 20L, "D"),
      (4L, "four", 20L, "I"))
      .toDF("id", "v", "seq", "op")
      .createOrReplaceTempView("pc_changes")
    spark.sql("""
      MERGE INTO gp.t t USING pc_changes s ON t.id = s.id
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v, seq = s.seq
      WHEN NOT MATCHED AND s.op <> 'D' THEN
        INSERT (id, v, seq) VALUES (s.id, s.v, s.seq)""")
    val want = List((1L, "ONE", 20L), (3L, "three", 10L),
      (4L, "four", 20L))
    assert(spark.table("gp.t").orderBy("id")
      .as[(Long, String, Long)].collect().toList === want)
    // the on-disk snapshot IS the table
    val td = tableDir(dir, "t")
    assert(spark.read.parquet(s"$td/data").orderBy("id")
      .as[(Long, String, Long)].collect().toList === want)
    // restart: a second catalog instance (fresh in-memory state)
    // over the same path reconstructs the table from disk
    registerCatalog("gp2", dir)
    assert(spark.table("gp2.t").orderBy("id")
      .as[(Long, String, Long)].collect().toList === want)
    spark.sql("DROP TABLE gp.t")
    assert(!new java.io.File(td).exists(),
      "DROP must remove the persisted snapshot")
  }

  test("INSERT OVERWRITE persists the truncated snapshot") {
    val dir = Files.createTempDirectory("graft-cat").toString
    registerCatalog("gpo", dir)
    spark.sql("CREATE TABLE gpo.ovw (id BIGINT)")
    spark.sql("INSERT INTO gpo.ovw VALUES (1), (2)")
    spark.sql("INSERT OVERWRITE gpo.ovw VALUES (7)")
    val td = tableDir(dir, "ovw")
    assert(spark.read.parquet(s"$td/data").as[Long]
      .collect().toList === List(7L))
    spark.sql("DROP TABLE gpo.ovw")
  }

  test("streaming MERGE upsert into a persisted table equals " +
      "Cdc.mergeLatest over the full log, across a restart") {
    val dir = Files.createTempDirectory("graft-cat").toString
    registerCatalog("gpu", dir)
    spark.sql("CREATE TABLE gpu.up (k BIGINT, v BIGINT, " +
      "last_seq BIGINT, last_op STRING)")
    val ckpt = Files.createTempDirectory("graft-up-ck").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Long)]
    val changes = in.toDF.toDF("k", "seq", "op", "v")
    val q = StreamOps.startMergeUpsert(changes, "gpu.up", ckpt,
      Seq("k"), "seq", "op")
    in.addData((1L, 0L, "I", 10L), (2L, 0L, "I", 20L),
      (3L, 0L, "I", 30L))
    q.processAllAvailable()
    in.addData((1L, 1L, "U", 11L), (3L, 1L, "D", 0L))
    q.processAllAvailable()
    q.stop()
    // restart from the same checkpoint, then more changes
    val q2 = StreamOps.startMergeUpsert(changes, "gpu.up", ckpt,
      Seq("k"), "seq", "op")
    in.addData((2L, 2L, "U", 22L), (4L, 2L, "I", 40L))
    q2.processAllAvailable()
    q2.stop()
    val log = Seq(
      (1L, 0L, "I", 10L), (2L, 0L, "I", 20L), (3L, 0L, "I", 30L),
      (1L, 1L, "U", 11L), (3L, 1L, "D", 0L),
      (2L, 2L, "U", 22L), (4L, 2L, "I", 40L))
      .toDF("k", "seq", "op", "v")
    val want = Cdc.mergeLatest(log, Seq("k"), "seq", "op",
        keepTombstones = true)
      .select("k", "v", "last_seq", "last_op")
      .as[(Long, Long, Long, String)].collect().toSet
    def got() = spark.table("gpu.up")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got() === want)
    // tombstone persisted (k=3, last_op=D), not resurrect-able
    assert(want.exists(r => r._1 == 3L && r._4 == "D"))
    // replaying a batch is a no-op (seq-guarded MERGE idempotence)
    StreamOps.mergeUpsertBatch(
      Seq((2L, 2L, "U", 22L), (4L, 2L, "I", 40L))
        .toDF("k", "seq", "op", "v"),
      "gpu.up", Seq("k"), "seq", "op")
    assert(got() === want)
    // a late lower-seq change loses to the applied tombstone
    StreamOps.mergeUpsertBatch(
      Seq((3L, 0L, "U", 99L)).toDF("k", "seq", "op", "v"),
      "gpu.up", Seq("k"), "seq", "op")
    assert(got() === want)
    // restart path: fresh catalog instance sees the final snapshot
    registerCatalog("gpu2", dir)
    assert(spark.table("gpu2.up")
      .as[(Long, Long, Long, String)].collect().toSet === want)
    spark.sql("DROP TABLE gpu.up")
  }

  test("time travel: VERSION AS OF / TIMESTAMP AS OF read the " +
      "retained snapshot chain, survive a restart, prune loudly") {
    val dir = Files.createTempDirectory("graft-cat-tt").toString
    registerCatalog("gtt", dir)
    spark.sql("CREATE TABLE gtt.tt (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gtt.tt VALUES (1, 'a')")      // version 0
    Thread.sleep(50)
    spark.sql("INSERT INTO gtt.tt VALUES (2, 'b')")      // version 1
    Thread.sleep(50)
    spark.sql("INSERT OVERWRITE gtt.tt VALUES (9, 'z')") // version 2

    def readV(cat: String, v: Long): List[(Long, String)] =
      spark.sql(s"SELECT * FROM $cat.tt VERSION AS OF $v")
        .orderBy("id").as[(Long, String)].collect().toList
    assert(readV("gtt", 0) === List((1L, "a")))
    assert(readV("gtt", 1) === List((1L, "a"), (2L, "b")))
    assert(readV("gtt", 2) === List((9L, "z"))) // current == log tail
    assert(spark.table("gtt.tt").orderBy("id")
      .as[(Long, String)].collect().toList === List((9L, "z")))

    // TIMESTAMP AS OF: the commit log is the resolution source —
    // pin the version-1 commit's own wall time
    val td = tableDir(dir, "tt")
    val commits = scala.io.Source.fromFile(s"$td/commits.json")
      .getLines().toSeq
    assert(commits.size === 3, commits.mkString("; "))
    val Line = """\{"version":(\d+),"ts_ms":(\d+)\}""".r
    val tsOf = commits.map { case Line(v, t) => v.toLong -> t.toLong }
      .toMap
    val t1 = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(tsOf(1L)),
      java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(
        s"SELECT * FROM gtt.tt TIMESTAMP AS OF '$t1'")
      .orderBy("id").as[(Long, String)].collect().toList ===
      List((1L, "a"), (2L, "b")))
    // before the first commit → loud failure, not an empty table
    val t00 = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(tsOf(0L) - 5000),
      java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val early = intercept[Exception](spark.sql(
      s"SELECT * FROM gtt.tt TIMESTAMP AS OF '$t00'").collect())
    assert(early.getMessage.contains("no commit"))

    // restart: a FRESH catalog instance resolves history from disk
    registerCatalog("gtt2", dir)
    assert(readV("gtt2", 0) === List((1L, "a")))
    assert(readV("gtt2", 2) === List((9L, "z")))

    // retention (default 3 retired): two more commits retire v2, v3
    // and prune v0
    spark.sql("INSERT INTO gtt.tt VALUES (10, 'y')")     // version 3
    spark.sql("INSERT INTO gtt.tt VALUES (11, 'x')")     // version 4
    val pruned = intercept[Exception](readV("gtt", 0))
    assert(pruned.getMessage.contains("not") &&
      pruned.getMessage.contains("available"),
      pruned.getMessage)
    assert(readV("gtt", 1) === List((1L, "a"), (2L, "b")))
    assert(readV("gtt", 4).toSet ===
      Set((9L, "z"), (10L, "y"), (11L, "x")))

    // history: every commit logged; v0 pruned-unavailable; the tail
    // is current; timestamps non-decreasing
    val hist = graft.sources.GraftCatalog.history(spark, "gtt", "tt")
      .orderBy("version")
      .as[(Long, Long, Boolean, Boolean)].collect().toList
    assert(hist.map(_._1) === List(0L, 1L, 2L, 3L, 4L))
    assert(hist.map(h => h._3) ===
      List(false, true, true, true, true))
    assert(hist.map(h => h._4) ===
      List(false, false, false, false, true))
    assert(hist.map(_._2) === hist.map(_._2).sorted)
    spark.sql("DROP TABLE gtt.tt")
  }

  test("in-memory catalog (no path) behaves as before: q162 surface " +
      "unchanged, RENAME still supported") {
    spark.sql("DROP TABLE IF EXISTS graft.pc_mem")
    spark.sql("CREATE TABLE graft.pc_mem (id BIGINT)")
    spark.sql("INSERT INTO graft.pc_mem VALUES (5)")
    assert(spark.table("graft.pc_mem").as[Long].collect().toList ===
      List(5L))
    spark.sql("ALTER TABLE graft.pc_mem RENAME TO pc_mem2")
    assert(spark.table("graft.pc_mem2").as[Long].collect().toList ===
      List(5L))
    spark.sql("DROP TABLE graft.pc_mem2")
  }
}
