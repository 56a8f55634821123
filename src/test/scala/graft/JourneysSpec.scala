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
}
