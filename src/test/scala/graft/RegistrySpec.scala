package graft

import org.apache.spark.sql.functions._
import graft.operators.Curate
import graft.streaming.StreamOps

/** Registry integrity + remaining operator coverage. */
class RegistrySpec extends SparkSpec {
  import spark.implicits._

  test("registry: query names unique, convention-compliant, oracles well-formed") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")),
      s"bad names: ${names.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+"))}")
    // every oracle references only driver-provided tables
    val tables = Set("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "events", "documents",
      "embeddings")
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).foreach {
      case (name, sql0) =>
        // EXTRACT(unit FROM expr) is not a relation reference
        val sql = sql0.replaceAll("(?i)EXTRACT\\s*\\([^)]*\\)", "")
        val froms = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        val cteNames =
          ("(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*" +
            "(?:MATERIALIZED\\s*)?\\(").r
            .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        val unknown = froms -- tables -- cteNames -
          "unnest" - "lateral" - "values"
        assert(unknown.isEmpty,
          s"$name references unknown relations: $unknown")
    }
  }

  test("every query runs and returns rows at sf0.001") {
    // smoke beyond the driver gate: non-empty results everywhere
    Registry.all.foreach { q =>
      val n = q.fn(spark, sf()).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("slidingAgg emits overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Double)]
    val out = StreamOps.slidingAgg(in.toDF().toDF("ts", "value"),
      "ts", "1 hour", "30 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("slide")
      .outputMode("update").start()
    in.addData((java.sql.Timestamp.valueOf("2024-01-01 00:40:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    // one event → exactly two overlapping hour windows (00:00, 00:30)
    val starts = spark.table("slide")
      .select(date_format($"window.start", "HH:mm")).as[String]
      .collect().sorted.toSeq
    assert(starts == Seq("00:00", "00:30"))
  }

  test("curate: quality gate, exact dups and near dups all removed") {
    // letter-only tokens: Curate.normalize strips digits
    val abc = ('a' to 'z').map(_.toString)
    val good = abc.take(15).flatMap(x => abc.take(2).map(y => x + y))
      .mkString(" ") // 30 distinct 2-letter tokens
    val other = abc.drop(13).flatMap(x => abc.drop(20).take(2)
      .map(y => x + y)).mkString(" ")
    val docs = Seq(
      (1L, good),                    // survives
      (2L, good),                    // exact dup of 1 → dropped
      (3L, good + " extra"),         // near dup of 1 → dropped
      (4L, "the the the the the"),   // stopword spam → quality gate
      (5L, other))                   // survives
      .toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text",
      minQuality = 0.5, n = 3, k = 6, bands = 3, minJaccard = 0.8)
    assert(out.select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 5L))
  }
}
