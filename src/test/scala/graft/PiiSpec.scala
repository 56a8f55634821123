package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Unit semantics for [[TextOps.maskPii]] / [[TextOps.piiCounts]]
  * (q180): per-kind masking, pattern ordering (SSN before phone),
  * near-miss safety, idempotence, and count alignment.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def mask(t: String): String =
    Seq(t).toDF("text").select(TextOps.maskPii(col("text")))
      .as[String].head()

  private def counts(t: String): (Long, Long, Long, Long) =
    Seq(t).toDF("text").select(TextOps.piiCounts(col("text")).as("c"))
      .select(col("c.n_email"), col("c.n_ssn"), col("c.n_phone"),
        col("c.n_ipv4"))
      .as[(Long, Long, Long, Long)].head()

  test("each kind masks to its typed placeholder") {
    assert(mask("mail a.b+c@d-e.example.org now") ===
      "mail <EMAIL> now")
    assert(mask("ssn 123-45-6789 end") === "ssn <SSN> end")
    assert(mask("call 555-867-5309 end") === "call <PHONE> end")
    assert(mask("host 192.168.0.1 end") === "host <IP> end")
  }

  test("a 3-2-4 digit group is an SSN, never a malformed phone") {
    assert(mask("id 321-54-9876 and line 777-123-4567") ===
      "id <SSN> and line <PHONE>")
  }

  test("near-misses do not mask") {
    val t = "almost 1234-56-789 and 12-345-6789 and 1.2.3 stay"
    assert(mask(t) === t)
    assert(counts(t) === ((0L, 0L, 0L, 0L)))
  }

  test("masking is idempotent and placeholders are PII-free") {
    val once = mask("a@b.co 123-45-6789 555-867-5309 8.8.8.8")
    assert(once === "<EMAIL> <SSN> <PHONE> <IP>")
    assert(mask(once) === once)
    assert(counts(once) === ((0L, 0L, 0L, 0L)))
  }

  test("counts run over the original text and see every occurrence") {
    assert(counts("x 9.9.9.9 then 9.9.9.9 and bob@corp.io") ===
      ((1L, 0L, 0L, 2L)))
  }

  test("leftmost-first on an over-long dotted quad") {
    assert(mask("trap 1.2.3.4.5 end") === "trap <IP>.5 end")
  }

  test("scrubbed streaming ingest dedups documents that differ only in PII") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val out = StreamOps.corpusIngest(
      in.toDF().toDF("ts", "text", "lang"), "ts", "text", "lang",
      watermark = "10 minutes", minQuality = 0.0, scrubPii = true)
    val q = out.writeStream.format("memory").queryName("pii_ingest")
      .outputMode("update").start()
    val t = Timestamp.valueOf("2024-01-01 00:01:00")
    // same form letter sent to two different addresses: after the
    // scrub both read "dear user <EMAIL> your code is <SSN>" and
    // the content-hash dedup collapses them; the third doc differs
    in.addData(
      (t, "dear user bob@corp.io your code is 123-45-6789", "en"),
      (t, "dear user eve@mail.net your code is 987-65-4321", "en"),
      (t, "completely different body with no identifiers", "en"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("pii_ingest")
      .select(col("lang"), col("n_docs")).as[(String, Long)]
      .collect().toMap
    assert(rows === Map("en" -> 2L),
      "PII-differing duplicates must collapse after the scrub")
  }
}
