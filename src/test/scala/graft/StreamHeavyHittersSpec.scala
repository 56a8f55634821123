package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming SpaceSaving heavy hitters
  * ([[StreamOps.heavyHittersStream]]): exact when capacity covers
  * the key universe (== batch counts, zero error), the textbook
  * overestimate + presence guarantees when it does not, a pinned
  * deterministic eviction trace, and split-invariance across
  * micro-batch boundaries.
  */
class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Run the stream over the given micro-batches; return the final
    * (max-ver) summary as item -> (est, err), merged over buckets. */
  private def run(batches: Seq[Seq[(Long, Long)]], name: String,
      buckets: Int, capacity: Int): Map[Long, (Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val out = StreamOps.heavyHittersStream(in.toDS(), buckets,
      capacity)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table(name)
      .select(col("bucket"), col("item"), col("est"), col("err"),
        col("ver"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val lastVer = rows.groupBy(_._1).map { case (b, rs) =>
      b -> rs.map(_._5).max
    }
    rows.filter(r => r._5 == lastVer(r._1))
      .map(r => r._2 -> ((r._3, r._4))).toMap
  }

  private val seqOf: Seq[Long] => Seq[(Long, Long)] =
    items => items.zipWithIndex.map { case (it, i) => (i.toLong, it) }

  test("capacity >= universe: exact counts, zero error, across splits") {
    val items = Seq(1L, 2L, 1L, 3L, 1L, 2L, 7L, 1L, 3L)
    val expected = items.groupBy(identity).map { case (k, v) =>
      k -> ((v.size.toLong, 0L))
    }
    val all = seqOf(items)
    val oneShot = run(Seq(all), "hh_one", buckets = 2, capacity = 8)
    val split = run(Seq(all.take(3), all.slice(3, 7), all.drop(7)),
      "hh_split", buckets = 2, capacity = 8)
    assert(oneShot === expected)
    assert(split === expected)
  }

  test("pinned eviction trace at capacity 2") {
    // single bucket, seq order A A B C:
    // A:(1,0) -> A:(2,0) -> B:(1,0) -> C evicts B (min est, min
    // item) -> C:(2,1)
    val got = run(Seq(seqOf(Seq(10L, 10L, 11L, 12L))), "hh_trace",
      buckets = 1, capacity = 2)
    assert(got === Map(10L -> ((2L, 0L)), 12L -> ((2L, 1L))))
  }

  test("SpaceSaving guarantees under pressure") {
    // skewed stream: item 1 dominates, many singletons fight over
    // the remaining counters
    val items = Seq.tabulate(60)(i =>
      if (i % 2 == 0) 1L else 100L + (i % 14)) // 30x item 1
    val truth = items.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = run(Seq(seqOf(items)), "hh_press", buckets = 1,
      capacity = 4)
    assert(got.size <= 4)
    // every summarized item: true <= est <= true + err
    got.foreach { case (item, (est, err)) =>
      val t = truth.getOrElse(item, 0L)
      assert(t <= est, s"item $item true $t > est $est")
      assert(est <= t + err,
        s"item $item est $est > true $t + err $err")
    }
    // presence: any item with true count > N/capacity is summarized
    val n = items.size
    truth.filter(_._2 > n / 4).keys.foreach(k =>
      assert(got.contains(k), s"heavy item $k missing from $got"))
  }

  test("bucket routing shards the summaries") {
    // two buckets by item parity; each holds its own counters
    val items = Seq(2L, 2L, 4L, 3L, 3L, 5L)
    val got = run(Seq(seqOf(items)), "hh_shard", buckets = 2,
      capacity = 8)
    assert(got === Map(2L -> ((2L, 0L)), 4L -> ((1L, 0L)),
      3L -> ((2L, 0L)), 5L -> ((1L, 0L))))
  }
}
