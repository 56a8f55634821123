package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch
import graft.operators.QuantileSketch.{SketchAgg, SketchMergeAgg}

/** Unit semantics for [[QuantileSketch]] (q202): the deterministic
  * MRL compactor's rank-error bound on adversarial orders, the
  * shard-rollup algebra (states merge; merged estimate ≈ one-pass
  * estimate), weight conservation, and degenerate inputs.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 512

  /** Local (driver-side) sketch build for order-controlled tests. */
  private def build(xs: Seq[Double], k: Int = K) =
    QuantileSketch.toState(
      xs.foldLeft(QuantileSketch.emptyBuf(k))(
        (b, x) => QuantileSketch.insert(b, x, k)))

  private def exactRank(xs: Seq[Double], v: Double): Long =
    xs.count(_ <= v).toLong

  test("weight conservation: sketch mass equals input count") {
    val xs = (1 to 10000).map(_.toDouble)
    val st = build(xs)
    val mass = st.zipWithIndex.map { case (vs, l) =>
      vs.size.toLong << l }.sum
    assert(mass === 10000L)
  }

  test("rank error within the deterministic bound on sorted, " +
      "reversed, and interleaved orders") {
    val n = 20000
    val base = (1 to n).map(_.toDouble)
    val orders = Seq(
      base, base.reverse,
      base.indices.map(i =>
        base((i * 7919) % n)) // fixed full-cycle permutation
    )
    for (xs <- orders; q <- Seq(0.5, 0.9, 0.99)) {
      val est = QuantileSketch.estimate(build(xs), Seq(q)).head
      val r = exactRank(base, est).toDouble / n
      assert(math.abs(r - q) <= 0.02,
        s"q=$q est=$est rank=$r order size=${xs.take(3)}")
    }
  }

  test("heavy duplication (skew) stays in band") {
    // 90% of mass at one value, tail uniform
    val xs = Seq.fill(18000)(42.0) ++ (1 to 2000).map(_ + 100.0)
    val st = build(xs)
    assert(QuantileSketch.estimate(st, Seq(0.5)).head === 42.0)
    val e99 = QuantileSketch.estimate(st, Seq(0.99)).head
    val r = xs.count(_ <= e99).toDouble / xs.size
    assert(math.abs(r - 0.99) <= 0.02, s"p99 est $e99 rank $r")
  }

  test("merged shard states estimate like a single-pass sketch") {
    val n = 30000
    val xs = (1 to n).map(i => ((i * 104729) % n).toDouble)
    val shards = xs.grouped(n / 7 + 1).toSeq
    val states = shards.map(build(_))
    val merged = QuantileSketch.toState(
      states.foldLeft(QuantileSketch.emptyBuf(K))(
        (b, s) => QuantileSketch.mergeState(b, s, K)))
    val mass = merged.zipWithIndex.map { case (vs, l) =>
      vs.size.toLong << l }.sum
    assert(mass === n.toLong)
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = QuantileSketch.estimate(merged, Seq(q)).head
      val r = xs.count(_ <= est).toDouble / n
      assert(math.abs(r - q) <= 0.03, s"merged q=$q rank=$r")
    }
  }

  test("tiny and empty inputs: exact below k, NaN on empty") {
    assert(QuantileSketch.estimate(build(Seq(5.0, 1.0, 3.0)),
      Seq(0.5)).head === 3.0)
    assert(QuantileSketch.estimate(build(Nil), Seq(0.5)).head.isNaN)
  }

  test("distributed two-level rollup matches the local algebra band") {
    val n = 20000
    val df = spark.range(n)
      .selectExpr(s"CAST((id * 7919) % $n AS DOUBLE) AS v",
        "CAST(id % 8 AS INT) AS shard")
    val sk = udaf(new SketchAgg(K), Encoders.scalaDouble)
    val mg = udaf(new SketchMergeAgg(K, Seq(0.5, 0.9, 0.99)),
      ExpressionEncoder[Seq[Seq[Double]]]())
    val est = df.groupBy(col("shard")).agg(sk(col("v")).as("state"))
      .agg(mg(col("state")).as("est"))
      .select(col("est")).as[Seq[Double]].head()
    val targets = Seq(0.5, 0.9, 0.99)
    est.zip(targets).foreach { case (e, q) =>
      val r = (e + 1) / n // values are 0..n-1, rank(v<=e) = e+1
      assert(math.abs(r - q) <= 0.02, s"q=$q est=$e rank=$r")
    }
  }

  test("append-only maintenance: folding a delta's states preserves the band") {
    // the IVM x sketch composition: an incrementally maintained
    // percentile view never rescans the base — new rows build their
    // own partial states and MERGE into the stored ones
    // (mergeability is the whole point of the compactor family; the
    // MRL rank bound holds under ANY merge order, so incremental ==
    // from-scratch CONTRACT-wise even though the buffers differ)
    val nBase = 16000
    val nDelta = 4000
    val n = nBase + nDelta
    val sk = udaf(new SketchAgg(K), Encoders.scalaDouble)
    val mg = udaf(new SketchMergeAgg(K, Seq(0.5, 0.9, 0.99)),
      ExpressionEncoder[Seq[Seq[Double]]]())
    def shards(from: Long, until: Long) =
      spark.range(from, until)
        .selectExpr(s"CAST((id * 7919) % $n AS DOUBLE) AS v",
          "CAST(id % 8 AS INT) AS shard")
        .groupBy(col("shard")).agg(sk(col("v")).as("state"))
    // stored per-shard states (base) + the delta's own states,
    // folded by the SAME second-level merge the query already runs —
    // zero base rescan, just 8 more state rows into the rollup
    val maintained = shards(0, nBase)
      .unionByName(shards(nBase, n))
      .agg(mg(col("state")).as("est"))
      .select(col("est")).as[Seq[Double]].head()
    val targets = Seq(0.5, 0.9, 0.99)
    maintained.zip(targets).foreach { case (e, q) =>
      val r = (e + 1) / n
      assert(math.abs(r - q) <= 0.02,
        s"maintained q=$q est=$e rank=$r")
    }
  }
}
