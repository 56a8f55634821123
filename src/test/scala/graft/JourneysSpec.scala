package graft

import org.apache.spark.sql.functions._

import graft.operators.Journeys

/** Hand-built event streams for the funnel and path-mining
  * operators: window edges (strictly-after, inclusive end), missing
  * steps, out-of-order noise, and tiebreak order. */
class JourneysSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, Long)]) =
    rows.toDF("user_id", "tsec", "event_type", "event_id")
      .select(col("user_id"),
        expr("timestamp_micros(tsec * 1000000)").as("ts"),
        col("event_type"), col("event_id"))

  test("funnelTimes: full conversion, window cut, missing steps") {
    val events = ev(Seq(
      // user 1: full funnel inside the window
      (1L, 1000L, "signup", 1L), (1L, 1100L, "click", 2L),
      (1L, 1200L, "purchase", 3L),
      // user 2: click arrives after the window -> stage 1 only
      (2L, 1000L, "signup", 4L), (2L, 6000L, "click", 5L),
      // user 3: click BEFORE signup doesn't count -> stage 1 only
      (3L, 900L, "click", 6L), (3L, 1000L, "signup", 7L),
      // user 4: never signs up -> absent entirely
      (4L, 1000L, "click", 8L), (4L, 1100L, "purchase", 9L),
      // user 5: click exactly at the window end (inclusive) counts;
      // purchase exactly at the click ts does NOT (strictly after)
      (5L, 1000L, "signup", 10L), (5L, 2000L, "click", 11L),
      (5L, 2000L, "purchase", 12L)))
    val got = Journeys.funnelTimes(events, "user_id", "event_type",
        "ts", Seq("signup", "click", "purchase"), windowSec = 1000L)
      .select(col("user_id"), col("stage"),
        unix_micros(col("t")).as("tm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set(
      (1L, 1L, 1000000000L), (1L, 2L, 1100000000L),
      (1L, 3L, 1200000000L),
      (2L, 1L, 1000000000L),
      (3L, 1L, 1000000000L),
      (5L, 1L, 1000000000L), (5L, 2L, 2000000000L)))
  }

  test("funnelTimes anchors on the FIRST occurrence of each step") {
    // second signup is closer to the click but the anchor is the
    // first signup, so the click falls outside the window
    val events = ev(Seq(
      (1L, 1000L, "signup", 1L), (1L, 5000L, "signup", 2L),
      (1L, 5100L, "click", 3L)))
    val got = Journeys.funnelTimes(events, "user_id", "event_type",
        "ts", Seq("signup", "click"), windowSec = 1000L)
      .select("stage").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("topPaths counts type trigrams in (ts, event_id) order") {
    val events = ev(Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "c", 3L),
      (1L, 4L, "d", 4L),
      (2L, 1L, "b", 5L), (2L, 2L, "c", 6L), (2L, 3L, "d", 7L),
      // user 3: same ts -> event_id breaks the tie as a,b,c
      (3L, 9L, "a", 8L), (3L, 9L, "b", 9L), (3L, 9L, "c", 10L)))
    val got = Journeys.topPaths(events, "user_id", "event_type", "ts",
        "event_id", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    // a>b>c x2 (users 1, 3), b>c>d x2 (users 1, 2); count ties break
    // on the gram text
    assert(got === List(("a>b>c", 2L), ("b>c>d", 2L)))
  }

  test("topPathsSessionized: no gram spans an inactivity gap") {
    // user 1: a,b,c then a 100s silence, then d,e,f — with gap=60s
    // that is TWO sessions: grams a>b>c and d>e>f, and crucially NOT
    // b>c>d or c>d>e (the lifetime-keyed topPaths emits both)
    val events = ev(Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "c", 3L),
      (1L, 103L, "d", 4L), (1L, 104L, "e", 5L), (1L, 105L, "f", 6L)))
    val sessioned = Journeys.topPathsSessionized(events, "user_id",
        "event_type", "ts", "event_id", gapSec = 60L, n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(sessioned === List(("a>b>c", 1L), ("d>e>f", 1L)))
    val lifetime = Journeys.topPaths(events, "user_id", "event_type",
        "ts", "event_id", n = 3, k = 10)
      .collect().map(_.getString(0)).toList
    assert(lifetime.contains("b>c>d") && lifetime.contains("c>d>e"),
      "fixture does not exercise the boundary (lifetime form should span it)")
  }

  test("topPathsSessionized with a gap wider than the data equals topPaths") {
    val events = ev(Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "c", 3L),
      (1L, 4L, "d", 4L),
      (2L, 1L, "b", 5L), (2L, 2L, "c", 6L), (2L, 3L, "d", 7L),
      (3L, 9L, "a", 8L), (3L, 9L, "b", 9L), (3L, 9L, "c", 10L)))
    val a = Journeys.topPaths(events, "user_id", "event_type", "ts",
        "event_id", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val b = Journeys.topPathsSessionized(events, "user_id",
        "event_type", "ts", "event_id", gapSec = 1000000L, n = 3,
        k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(a === b)
  }

  test("topPathsSessionized plans ONE exchange on the user key before grams") {
    val events = ev(Seq((1L, 1L, "a", 1L), (1L, 2L, "b", 2L)))
    val plan = Journeys.topPathsSessionized(events, "user_id",
        "event_type", "ts", "event_id", gapSec = 60L, n = 3, k = 10)
      .queryExecution.executedPlan.toString
    // the (user, session) groupBy must reuse the session window's
    // user-hash partitioning — exchanges: one for the window, one
    // for the global gram count, none between
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges <= 2, s"unexpected extra shuffle:\n$plan")
  }

  // ---- matchRecognize ----

  private def mr(events: org.apache.spark.sql.DataFrame,
      pattern: String, gapSec: Long = 1000L) =
    Journeys.matchRecognize(events, "user_id", "ts", "event_id",
        "event_type", pattern, gapSec)
      .orderBy("user_id", "session_id", "match_no")
      .as[(Long, Long, Long, String, Long)].collect().toList

  test("matchRecognize: contiguous matches only, skip past last row") {
    // user 1: a b b c a c — 'a b+ c' matches a>b>b>c once; the later
    // a,c are NOT adjacent so no second match. user 2: a c adjacent
    // but no b (required +) -> no match.
    val events = ev(Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "b", 3L),
      (1L, 4L, "c", 4L), (1L, 5L, "a", 5L), (1L, 6L, "c", 6L),
      (2L, 1L, "a", 7L), (2L, 2L, "c", 8L)))
    assert(mr(events, "a b+ c") ===
      List((1L, 0L, 1L, "a>b>b>c", 4L)))
    // optional step: 'a b? c' admits at most ONE b, so user 1's
    // a>b>b>c run does NOT match — the trailing a>c does, as does
    // user 2's
    assert(mr(events, "a b? c") ===
      List((1L, 0L, 1L, "a>c", 2L), (2L, 0L, 1L, "a>c", 2L)))
  }

  test("matchRecognize: non-overlapping — second match starts after " +
      "the first ends") {
    // a b c a b c: two disjoint matches, match_no 1 and 2
    val events = ev((1L to 6L).map(i =>
      (1L, i, Seq("a", "b", "c")((i.toInt - 1) % 3), i)))
    assert(mr(events, "a b c") ===
      List((1L, 0L, 1L, "a>b>c", 3L), (1L, 0L, 2L, "a>b>c", 3L)))
  }

  test("matchRecognize: a match never spans an inactivity gap") {
    // a b | (gap) | c  with gap=60: b and c are adjacent in lifetime
    // order but in different sessions -> no 'a b c' match; with a
    // huge gap the match appears
    val events = ev(Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 200L, "c", 3L)))
    assert(mr(events, "a b c", gapSec = 60L) === Nil)
    assert(mr(events, "a b c", gapSec = 100000L) ===
      List((1L, 0L, 1L, "a>b>c", 3L)))
  }

  test("matchRecognize: ties break on the tiebreak column") {
    // same ts: event_id orders a before b
    val events = ev(Seq(
      (1L, 5L, "b", 2L), (1L, 5L, "a", 1L), (1L, 6L, "c", 3L)))
    assert(mr(events, "a b c") === List((1L, 0L, 1L, "a>b>c", 3L)))
  }

  test("matchRecognize rejects malformed and all-optional patterns") {
    val events = ev(Seq((1L, 1L, "a", 1L)))
    intercept[IllegalArgumentException] {
      Journeys.matchRecognize(events, "user_id", "ts", "event_id",
        "event_type", "a.* b", 10L)
    }
    intercept[IllegalArgumentException] {
      Journeys.matchRecognize(events, "user_id", "ts", "event_id",
        "event_type", "a? b*", 10L)
    }
    intercept[IllegalArgumentException] {
      Journeys.matchRecognize(events, "user_id", "ts", "event_id",
        "event_type", "  ", 10L)
    }
  }
}
