package graft

import org.apache.spark.sql.functions._
import graft.operators.{Attribution, Cdc}

/** Unit semantics for the q162-q164 operator family: CDC last-wins
  * merge (tombstones, resurrection, partial-aggregability) and
  * multi-touch attribution (model weights, direct credit, exact
  * integer splits).
  */
class ChangesSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (Long, Long, String, Long)*) =
    rows.toDF("k", "seq", "op", "v")

  test("mergeLatest: last change wins per key") {
    val out = Cdc.mergeLatest(
      log((1L, 0L, "I", 10L), (1L, 1L, "U", 20L), (1L, 2L, "U", 30L),
        (2L, 0L, "I", 5L)),
      Seq("k"), "seq", "op")
    val m = out.select("k", "v", "last_seq", "last_op")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(m.toSeq === Seq((1L, 30L, 2L, "U"), (2L, 5L, 0L, "I")))
  }

  test("mergeLatest: delete tombstone removes the key") {
    val out = Cdc.mergeLatest(
      log((1L, 0L, "I", 10L), (1L, 1L, "D", 0L), (2L, 0L, "I", 7L)),
      Seq("k"), "seq", "op")
    assert(out.select("k").as[Long].collect().toSeq === Seq(2L))
  }

  test("mergeLatest: re-insert after delete resurrects the key") {
    val out = Cdc.mergeLatest(
      log((1L, 0L, "I", 10L), (1L, 1L, "D", 0L), (1L, 2L, "I", 99L)),
      Seq("k"), "seq", "op")
    val m = out.select("k", "v", "last_seq").as[(Long, Long, Long)]
      .collect()
    assert(m.toSeq === Seq((1L, 99L, 2L)))
  }

  test("mergeLatest: result is partition-layout independent") {
    val rows = (0L until 400L).map(i =>
      (i % 40, i / 40, if (i % 97 == 13) "D" else "U", i))
    val a = Cdc.mergeLatest(rows.toDF("k", "seq", "op", "v")
        .repartition(1), Seq("k"), "seq", "op")
      .orderBy("k").collect().toSeq
    val b = Cdc.mergeLatest(rows.toDF("k", "seq", "op", "v")
        .repartition(7, col("v")), Seq("k"), "seq", "op")
      .orderBy("k").collect().toSeq
    assert(a === b)
  }

  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("user_id", "event_id", "tsec", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("tsec")))

  private def credits(df: org.apache.spark.sql.DataFrame) =
    Attribution.credits(df, "user_id", "event_id", "ts",
      "event_type", "value", "purchase", Seq("click", "view"),
      lookbackMicros = 100L * 1000000L)

  test("snapshotDiff: insert/delete/update classes; null-safe payload; no-change silence") {
    val a = Seq((1L, Option("x")), (2L, Option("y")),
        (3L, Option.empty[String]), (4L, Option("same")))
      .toDF("k", "v")
    val b = Seq((2L, Option("Y")), (3L, Option("now")),
        (4L, Option("same")), (5L, Option.empty[String]))
      .toDF("k", "v")
    val got = Cdc.snapshotDiff(a, b, Seq("k"))
      .as[(Long, Option[String], String)].collect().toSet
    assert(got === Set(
      (1L, Some("x"), "delete"),          // only in a — a's row
      (2L, Some("Y"), "update"),          // payload differs — postimage
      (3L, Some("now"), "update"),        // NULL -> value IS a change
      (5L, None, "insert")))              // only in b — b's row
    // k=4 unchanged: emits nothing (asserted by the exact set above)
  }

  test("snapshotDiff: NULL -> NULL payload is not a change; schema mismatch rejected") {
    val a = Seq((1L, Option.empty[String])).toDF("k", "v")
    val b = Seq((1L, Option.empty[String])).toDF("k", "v")
    assert(Cdc.snapshotDiff(a, b, Seq("k")).count() === 0L)
    val bad = Seq((1L, "x")).toDF("k", "w")
    val e = intercept[IllegalArgumentException](
      Cdc.snapshotDiff(a, bad, Seq("k")))
    assert(e.getMessage.contains("schemas differ"))
  }

  test("attribution: first/last/linear split over three touches") {
    // touches at t=10,20,30; purchase 3.33 at t=40 → 333 cents
    val out = credits(ev(
      (1L, 101L, 10L, "click", 0d), (1L, 102L, 20L, "view", 0d),
      (1L, 103L, 30L, "click", 0d), (1L, 200L, 40L, "purchase", 3.33d)))
      .orderBy("channel", "first_cents")
    val rows = out
      .select("channel", "n_touches", "first_cents", "last_cents",
        "linear_millis")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // first = click@10, last = click@30, linear = 333000 div 3 each
    assert(rows === Seq(
      ("click", 3L, 0L, 333L, 111000L),
      ("click", 3L, 333L, 0L, 111000L),
      ("view", 3L, 0L, 0L, 111000L)))
  }

  test("attribution: untouched purchase credits (direct) in full") {
    val out = credits(ev((1L, 200L, 40L, "purchase", 2.00d)))
    val r = out.select("channel", "first_cents", "last_cents",
        "linear_millis")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r === Seq(("(direct)", 200L, 200L, 200000L)))
  }

  test("attribution: lookback window excludes old/future touches") {
    val out = credits(ev(
      (1L, 100L, 10L, "click", 0d),      // 190s before: outside
      (1L, 101L, 150L, "view", 0d),      // inside window
      (1L, 102L, 201L, "click", 0d),     // after purchase: excluded
      (1L, 200L, 200L, "purchase", 1.00d)))
    val r = out.select("channel", "first_cents")
      .as[(String, Long)].collect().toSeq
    assert(r === Seq(("view", 100L)))
  }

  test("attribution: touches credit only same-user purchases") {
    val out = credits(ev(
      (1L, 101L, 10L, "click", 0d),
      (2L, 200L, 20L, "purchase", 1.00d)))
    val r = out.select("channel").as[String].collect().toSeq
    assert(r === Seq("(direct)"))
  }
}
