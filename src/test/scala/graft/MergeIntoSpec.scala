package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Declarative ANSI MERGE INTO over the [[graft.sources
  * .GraftCatalog]] v2 catalog: Spark's own RewriteMergeIntoTable
  * plans the statement against the in-memory row-level-operation
  * table, and the result must be SEMANTICALLY equal to
  * [[Cdc.mergeLatest]] over the corresponding change log (the q162
  * operator surface) — upsert + delete in one statement, the form
  * users actually type.
  */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def dropIfExists(name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")

  test("CREATE / INSERT / SELECT round-trip through the catalog") {
    dropIfExists("graft.rt")
    spark.sql("CREATE TABLE graft.rt (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.rt VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.rt VALUES (3, 'c')")
    assert(spark.table("graft.rt").orderBy("id")
      .as[(Long, String)].collect().toList ===
      List((1L, "a"), (2L, "b"), (3L, "c")))
    spark.sql("DROP TABLE graft.rt")
    intercept[Exception] { spark.table("graft.rt").collect() }
  }

  test("MERGE INTO: update + delete + insert in one statement " +
      "equals Cdc.mergeLatest on the corresponding log") {
    dropIfExists("graft.tgt")
    spark.sql("CREATE TABLE graft.tgt (id BIGINT, v STRING, " +
      "seq BIGINT)")
    spark.sql("INSERT INTO graft.tgt VALUES " +
      "(1, 'one', 10), (2, 'two', 10), (3, 'three', 10)")
    // changes: update id=1, delete id=2, insert id=4, and a no-op
    // delete for an absent key (id=9) that must not insert
    Seq((1L, "ONE", 20L, "U"), (2L, "", 20L, "D"),
      (4L, "four", 20L, "I"), (9L, "", 20L, "D"))
      .toDF("id", "v", "seq", "op")
      .createOrReplaceTempView("changes")
    spark.sql("""
      MERGE INTO graft.tgt t
      USING changes s
      ON t.id = s.id
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v, seq = s.seq
      WHEN NOT MATCHED AND s.op <> 'D' THEN
        INSERT (id, v, seq) VALUES (s.id, s.v, s.seq)""")
    val merged = spark.table("graft.tgt").orderBy("id")
      .as[(Long, String, Long)].collect().toList
    assert(merged === List((1L, "ONE", 20L), (3L, "three", 10L),
      (4L, "four", 20L)))
    // the operator-surface equivalent: initial snapshot as seq-10
    // upserts + the change log, folded by mergeLatest
    val log = Seq(
      (1L, "one", 10L, "U"), (2L, "two", 10L, "U"),
      (3L, "three", 10L, "U"),
      (1L, "ONE", 20L, "U"), (2L, "", 20L, "D"),
      (4L, "four", 20L, "I"), (9L, "", 20L, "D"))
      .toDF("id", "v", "seq", "op")
    val viaCdc = Cdc.mergeLatest(log, Seq("id"), "seq", "op",
        keepTombstones = false)
      .orderBy("id").select("id", "v", "last_seq")
      .as[(Long, String, Long)].collect().toList
    assert(merged === viaCdc)
    spark.sql("DROP TABLE graft.tgt")
  }

  test("MERGE is idempotent for upsert-shaped sources and repeated " +
      "runs keep cardinality") {
    dropIfExists("graft.idem")
    spark.sql("CREATE TABLE graft.idem (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.idem VALUES (1, 'x')")
    Seq((1L, "y"), (2L, "z")).toDF("id", "v")
      .createOrReplaceTempView("ups")
    val stmt = """
      MERGE INTO graft.idem t USING ups s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *"""
    spark.sql(stmt)
    spark.sql(stmt)
    assert(spark.table("graft.idem").orderBy("id")
      .as[(Long, String)].collect().toList ===
      List((1L, "y"), (2L, "z")))
    spark.sql("DROP TABLE graft.idem")
  }

  test("INSERT OVERWRITE truncates through the same write path") {
    dropIfExists("graft.ovw")
    spark.sql("CREATE TABLE graft.ovw (id BIGINT)")
    spark.sql("INSERT INTO graft.ovw VALUES (1), (2)")
    spark.sql("INSERT OVERWRITE graft.ovw VALUES (7)")
    assert(spark.table("graft.ovw").as[Long].collect().toList ===
      List(7L))
    spark.sql("DROP TABLE graft.ovw")
  }

  test("MERGE plans the group-based ReplaceData rewrite (no " +
      "driver-side row loop)") {
    dropIfExists("graft.plan")
    spark.sql("CREATE TABLE graft.plan (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.plan VALUES (1, 'a')")
    Seq((1L, "b")).toDF("id", "v").createOrReplaceTempView("pl_src")
    val plan = spark.sessionState.sqlParser.parsePlan("""
      MERGE INTO graft.plan t USING pl_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val analyzed =
      spark.sessionState.analyzer.executeAndCheck(plan,
        new org.apache.spark.sql.catalyst.QueryPlanningTracker())
    // Catalyst's row-level rewrite must have replaced MergeIntoTable
    // with the group-based ReplaceData command
    assert(analyzed.getClass.getSimpleName === "ReplaceData",
      s"got ${analyzed.getClass} / $analyzed")
    spark.sql("DROP TABLE graft.plan")
  }
}
