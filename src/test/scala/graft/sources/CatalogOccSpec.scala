package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

import graft.SparkSpec

/** Write-time optimistic concurrency + crash-window reads for the
  * persisted [[GraftCatalog]] (r15; VERDICT ask 4 + ADVICE).
  *
  * The single-writer contract is now ENFORCED, not prose: a working
  * copy that commits after another catalog instance already swapped
  * a newer snapshot under the same path must abort loudly with a
  * ConcurrentModificationException instead of silently retiring the
  * winner's snapshot (the lost-update anatomy: both writers load the
  * same base, A commits, B's commit would write base+B — losing A).
  * This spec lives in package graft.sources so it can hold a stale
  * working copy across the other instance's commit — the exact
  * window the SQL surface heals too early to stage (loadTable
  * re-reads a stale copy from disk before each statement).
  */
class CatalogOccSpec extends SparkSpec {
  import spark.implicits._

  private def registerCatalog(name: String, dir: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.path", dir)
  }

  private def memTable(cat: String, table: String): GraftMemTable = {
    val c = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[TableCatalog]
    c.loadTable(Identifier.of(Array.empty[String], table))
      .asInstanceOf[GraftMemTable]
  }

  test("commit-time OCC: a writer whose base is stale aborts loudly; " +
      "exactly one racing commit wins; history stays consistent") {
    val dir = Files.createTempDirectory("graft-occ").toString
    registerCatalog("goa", dir)
    spark.sql("CREATE TABLE goa.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO goa.t VALUES (1, 'base')") // version 0
    // instance B: a second catalog over the same path, holding a
    // working copy loaded BEFORE A's next commit
    registerCatalog("gob", dir)
    val tb = memTable("gob", "t")
    assert(!tb.isStaleOnDisk)
    // A commits version 1
    spark.sql("INSERT INTO goa.t VALUES (2, 'winner')")
    // B, still holding the version-0 working copy, tries to commit —
    // without OCC this would persist base-only rows (lost update)
    // AND retire A's snapshot as if it were history
    val e = intercept[java.util.ConcurrentModificationException] {
      tb.replaceAll(tb.currentRows)
    }
    assert(e.getMessage.contains("concurrent commit"))
    // winner's state is intact — via A, via a reloaded B (the read
    // path heals staleness), and via a fresh instance
    val want = List((1L, "base"), (2L, "winner"))
    assert(spark.table("goa.t").orderBy("id")
      .as[(Long, String)].collect().toList === want)
    assert(spark.table("gob.t").orderBy("id")
      .as[(Long, String)].collect().toList === want)
    registerCatalog("goc", dir)
    assert(spark.table("goc.t").orderBy("id")
      .as[(Long, String)].collect().toList === want)
    // history: exactly versions 0 and 1, tail current — the loser
    // left no fork, no phantom commit, no retired-winner snapshot
    val hist = GraftCatalog.history(spark, "goa", "t")
      .orderBy("version")
      .as[(Long, Long, Boolean, Boolean)].collect().toList
    assert(hist.map(_._1) === List(0L, 1L))
    assert(hist.map(_._4) === List(false, true))
    // the loser recovers by reloading (fresh working copy) and
    // re-applying its write — the documented retry path
    spark.sql("INSERT INTO gob.t VALUES (3, 'retry')") // version 2
    assert(spark.table("goa.t").orderBy("id")
      .as[(Long, String)].collect().toList ===
      want :+ ((3L, "retry")))
    spark.sql("DROP TABLE goa.t")
  }

  test("crash window between data swap and log append: VERSION AS OF " +
      "the log tail reads the retired true copy, not the newer data") {
    val dir = Files.createTempDirectory("graft-occ-cw").toString
    registerCatalog("gcw", dir)
    spark.sql("CREATE TABLE gcw.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gcw.t VALUES (1, 'a')")       // version 0
    spark.sql("INSERT OVERWRITE gcw.t VALUES (2, 'b')")  // version 1
    // simulate the crash: commit 1's data swap landed (data = v1
    // rows, versions/v0 retired) but the log append did not — drop
    // the last commits.json entry so the tail says version 0
    import scala.jdk.CollectionConverters._
    val td = Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala
      .find(_.getFileName.toString == "commits.json")
      .map(_.getParent).getOrElse(fail("no persisted table dir"))
    val commitsPath = td.resolve("commits.json")
    val lines = Files.readAllLines(commitsPath).asScala.toList
    assert(lines.size === 2)
    Files.write(commitsPath, List(lines.head).asJava)
    // the local Hadoop fs keeps a checksum sidecar — drop it so the
    // hand-truncated log reads back (a real crash truncates both)
    Files.deleteIfExists(td.resolve(".commits.json.crc"))
    // a fresh instance in that window: VERSION AS OF 0 (the log
    // tail) must come from versions/v0 — NOT from data, which
    // already holds version 1's rows
    registerCatalog("gcw2", dir)
    assert(spark.sql("SELECT * FROM gcw2.t VERSION AS OF 0")
      .as[(Long, String)].collect().toList === List((1L, "a")))
    // the next commit re-derives the version counter from the
    // versions/ listing (v0 retired → next is 1+1=... max(tail+1,
    // maxRetired+2)) and the chain heals without forking
    spark.sql("INSERT INTO gcw2.t VALUES (3, 'c')")
    val hist = GraftCatalog.history(spark, "gcw2", "t")
      .orderBy("version")
      .as[(Long, Long, Boolean, Boolean)].collect().toList
    assert(hist.map(_._1) === hist.map(_._1).distinct, "forked chain")
    assert(spark.sql(s"SELECT * FROM gcw2.t VERSION AS OF 0")
      .as[(Long, String)].collect().toList === List((1L, "a")))
    spark.sql("DROP TABLE gcw2.t")
  }
}
