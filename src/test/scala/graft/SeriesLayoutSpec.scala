package graft

import org.apache.spark.sql.functions._
import graft.operators.{Frontier, Intervals, ZOrder}

/** Unit tests for the q105-q109 operator family: interval-merge edge
  * cases the fixture data can't isolate (touching spans, containment,
  * equal starts), skyline tie/dominance cases plus the distributive
  * two-phase == brute-force property, Morton-curve bit arithmetic
  * against hand-interleaved values, and the fixed-point EMA fold.
  */
class SeriesLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def merged(rows: Seq[(Long, Long, Long, Long)])
      : Seq[(Long, Long, Long, Long)] = {
    val df = rows.toDF("k", "id", "s", "e")
    Intervals.merge(df, "k", "s", "e", "id")
      .select("k", "m_start", "m_end", "n_source")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
  }

  test("overlapping and touching intervals coalesce; disjoint stay apart") {
    // [0,10) + [5,15) overlap; [15,20) touches (half-open -> merges);
    // [30,40) is disjoint.
    val got = merged(Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 15L),
      (1L, 3L, 15L, 20L), (1L, 4L, 30L, 40L)))
    assert(got == Seq((1L, 0L, 20L, 3L), (1L, 30L, 40L, 1L)))
  }

  test("contained interval extends nothing; chain via running max") {
    // [0,100) swallows [10,20); [50,120) overlaps the RUNNING max
    // (100) even though it starts after the previous row's own end.
    val got = merged(Seq(
      (7L, 1L, 0L, 100L), (7L, 2L, 10L, 20L), (7L, 3L, 50L, 120L)))
    assert(got == Seq((7L, 0L, 120L, 3L)))
  }

  test("equal starts are tie-proof; keys never cross-merge") {
    val got = merged(Seq(
      (1L, 2L, 5L, 8L), (1L, 1L, 5L, 6L),
      (2L, 3L, 5L, 6L), (2L, 4L, 100L, 101L)))
    assert(got == Seq((1L, 5L, 8L, 2L),
      (2L, 5L, 6L, 1L), (2L, 100L, 101L, 1L)))
  }

  private def sky(pts: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val df = pts.toDF("x", "y")
    Frontier.skyline(df, "x", "y", "floor(x / 10.0)")
      .orderBy("x").as[(Double, Long)].collect().toSeq
  }

  private def brute(pts: Seq[(Double, Long)]): Seq[(Double, Long)] =
    pts.distinct.filter { case (x, y) =>
      !pts.exists { case (x2, y2) =>
        (x2 <= x && y2 >= y) && (x2 < x || y2 > y)
      }
    }.sortBy(_._1)

  test("skyline drops dominated points, keeps the frontier") {
    val pts = Seq((1.0, 5L), (2.0, 9L), (3.0, 9L), (4.0, 12L),
      (5.0, 3L), (0.5, 1L))
    // (3,9) dominated by (2,9); (5,3) and (1,5)... (1,5) survives
    // (nothing cheaper has >=5); (0.5,1) survives as the cheapest.
    assert(sky(pts) == brute(pts))
    assert(sky(pts) == Seq((0.5, 1L), (1.0, 5L), (2.0, 9L), (4.0, 12L)))
  }

  test("same-x keeps only max y; duplicates collapse") {
    val pts = Seq((1.0, 5L), (1.0, 7L), (1.0, 7L), (2.0, 6L))
    assert(sky(pts) == Seq((1.0, 7L)))
  }

  test("two-phase banded skyline equals brute force across band edges") {
    // points straddling band boundaries (bands of width 10)
    val pts = (0 until 60).map { i =>
      (i.toDouble, ((i * 37) % 41 + (if (i % 7 == 0) 30 else 0)).toLong)
    }
    assert(sky(pts) == brute(pts))
  }

  private def sky3(pts: Seq[(Double, Long, Long)])
      : Set[(Double, Long, Long)] = {
    val df = pts.toDF("x", "y", "z")
    Frontier.skyline3(df, "x", "y", "z", "floor(x / 10.0)")
      .as[(Double, Long, Long)].collect().toSet
  }

  private def brute3(pts: Seq[(Double, Long, Long)])
      : Set[(Double, Long, Long)] = {
    // phase-0 mirror: one candidate per (x, y), max z
    val cand = pts.groupBy(p => (p._1, p._2))
      .map { case ((x, y), ps) => (x, y, ps.map(_._3).max) }.toSeq
    cand.filter { case (x, y, z) =>
      !cand.exists { case (x2, y2, z2) =>
        x2 <= x && y2 >= y && z2 >= z && (x2 < x || y2 > y || z2 > z)
      }
    }.toSet
  }

  test("3-D skyline: dominance in all three, incomparable rows survive") {
    val pts = Seq(
      (1.0, 5L, 5L),   // survives: cheapest
      (2.0, 9L, 1L),   // survives: best y among x<=2
      (2.0, 1L, 9L),   // survives: best z among x<=2 (incomparable to above)
      (3.0, 8L, 1L),   // dominated by (2,9,1)
      (3.0, 9L, 1L),   // dominated: same (y,z) as (2,9,1), worse x
      (4.0, 12L, 12L), // survives: global best y and z
      (5.0, 12L, 12L)) // dominated by (4,12,12)
    assert(sky3(pts) == brute3(pts))
    assert(sky3(pts) == Set((1.0, 5L, 5L), (2.0, 9L, 1L),
      (2.0, 1L, 9L), (4.0, 12L, 12L)))
  }

  test("3-D skyline: same-(x,y) keeps max z; exact duplicates collapse") {
    val pts = Seq((1.0, 5L, 3L), (1.0, 5L, 7L), (1.0, 5L, 7L),
      (2.0, 5L, 7L))
    assert(sky3(pts) == Set((1.0, 5L, 7L)))
  }

  test("3-D banded two-phase equals brute force across band edges") {
    val pts = (0 until 90).map { i =>
      (i.toDouble,
        ((i * 37) % 41 + (if (i % 7 == 0) 30 else 0)).toLong,
        ((i * 53) % 47 + (if (i % 11 == 0) 25 else 0)).toLong)
    }
    assert(sky3(pts) == brute3(pts))
  }

  test("3-D skyline on empty input returns empty, not error") {
    val noPts = Seq.empty[(Double, Long, Long)].toDF("x", "y", "z")
    assert(Frontier.skyline3(noPts, "x", "y", "z", "floor(x / 10.0)")
      .count() == 0)
  }

  test("morton interleave matches hand-computed bit weave") {
    // x=0b0011=3 -> even bits 0b0101=5; y=0b0101=5 -> odd bits of
    // spread16(5)=0b010001 shifted: z = 5 | (17<<1) = 0b100111 = 39
    val df = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrder.interleave16(col("x"), col("y")).as("z"),
        ZOrder.spread16(col("x")).as("sx"),
        ZOrder.spread16(col("y")).as("sy"))
    val r = df.as[(Long, Long, Long)].head()
    assert(r._2 == 5L && r._3 == 17L && r._1 == 39L)
  }

  test("morton key is a bijection on a 32x32 grid") {
    val df = spark.range(1024).select(
      (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
    val keys = df.select(ZOrder.interleave16(col("x"), col("y")).as("z"))
    assert(keys.distinct().count() == 1024)
    assert(keys.agg(max("z"), min("z")).as[(Long, Long)].head() ==
      ((1023L, 0L)))
  }

  test("fixing high curve bits bounds BOTH coordinate spans") {
    // 10-bit coords, bucket on the top 6 of 20 z bits: each bucket's
    // bbox must fit a 128x128 cell.
    val df = spark.range(4096).select(
      ((col("id") * 2654435761L) % 1024).as("x"),
      ((col("id") * 40503L) % 1024).as("y"))
    val spans = df
      .withColumn("z", ZOrder.interleave16(col("x"), col("y")))
      .withColumn("b", expr("z div 16384"))
      .groupBy("b")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .agg(max("xs"), max("ys")).as[(Long, Long)].head()
    assert(spans._1 <= 127 && spans._2 <= 127)
  }

  test("N-dim interleave at dims=2 reproduces interleave16 bit-for-bit") {
    val df = spark.range(4096).select(
      ((col("id") * 2654435761L) % 65536).as("x"),
      ((col("id") * 40503L) % 65536).as("y"))
    val diff = df.select(
        ZOrder.interleave16(col("x"), col("y")).as("a"),
        ZOrder.interleave(Seq(col("x"), col("y")), bits = 16).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("3-D morton key is a bijection on an 8x8x8 grid") {
    val df = spark.range(512).select(
      (col("id") % 8).as("x"),
      ((col("id") / 8) % 8).cast("long").as("y"),
      (col("id") / 64).cast("long").as("w"))
    val keys = df.select(
      ZOrder.interleave(Seq(col("x"), col("y"), col("w")), bits = 3)
        .as("z"))
    assert(keys.distinct().count() == 512)
    assert(keys.agg(max("z"), min("z")).as[(Long, Long)].head() ==
      ((511L, 0L)))
  }

  test("fixing high 3-D curve bits bounds ALL THREE coordinate spans") {
    // 10-bit coords, bucket on the top 6 of 30 z bits: top 2 bits of
    // each dim pinned -> every bbox fits a 256^3 cell.
    val df = spark.range(8192).select(
      ((col("id") * 2654435761L) % 1024).as("x"),
      ((col("id") * 40503L) % 1024).as("y"),
      ((col("id") * 69069L) % 1024).as("w"))
    val spans = df
      .withColumn("z",
        ZOrder.interleave(Seq(col("x"), col("y"), col("w")), bits = 10))
      .withColumn("b", expr("z div 16777216"))
      .groupBy("b")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"),
        (max("w") - min("w")).as("ws"))
      .agg(max("xs"), max("ys"), max("ws")).as[(Long, Long, Long)].head()
    assert(spans._1 <= 255 && spans._2 <= 255 && spans._3 <= 255, spans)
  }

  test("spreadBits rejects overflow and degenerate shapes") {
    intercept[IllegalArgumentException] {
      ZOrder.spreadBits(col("x"), dims = 4, bits = 16) // 64 > 63
    }
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq.empty, bits = 8)
    }
  }

  test("empty inputs: interval merge and skyline return empty, not error") {
    val noIv = Seq.empty[(Long, Long, Long, Long)].toDF("k", "id", "s", "e")
    assert(Intervals.merge(noIv, "k", "s", "e", "id").count() == 0)
    val noPts = Seq.empty[(Double, Long)].toDF("x", "y")
    assert(Frontier.skyline(noPts, "x", "y", "floor(x / 10.0)")
      .count() == 0)
  }

  test("interval merge of uniform spans == gap sessionization (operators cohere)") {
    // For point events expanded to uniform [t, t+g) spans, the merge
    // boundary (start > running-max end) reduces to the session
    // boundary (gap to predecessor > g): same groups, same counts,
    // session_end + g == merged end.
    import graft.operators.Sessionize
    val ev = Tables.events(spark, sf()).filter(col("user_id") < 20)
    val g = 1800L
    val sessions = Sessionize
      .sessionStats(ev, "user_id", "ts", g)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("ss"),
        (unix_micros(col("session_end")) + g * 1000000L).as("se"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val spans = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s0"))
      .withColumn("e0", col("s0") + lit(g * 1000000L))
    val merged = Intervals.merge(spans, "user_id", "s0", "e0", "event_id")
      .select(col("user_id"), col("m_start"), col("m_end"),
        col("n_source"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(sessions.nonEmpty && merged == sessions)
  }

  test("fixed-point EMA fold matches the hand recursion") {
    // values in milli-cents; alpha=0.3: r = (3*v + 7*r) div 10
    val arr = Seq(1000L, 2000L, 3000L)
    val want = arr.tail.foldLeft(arr.head)((r, v) => (3 * v + 7 * r) / 10)
    val got = Seq(Tuple1(arr)).toDF("arr")
      .select(expr("""aggregate(
          slice(arr, 2, size(arr) - 1), element_at(arr, 1),
          (acc, x) -> (3 * x + 7 * acc) div 10)""").as("ema"))
      .as[Long].head()
    assert(got == want && got == 1810L)
  }
}
