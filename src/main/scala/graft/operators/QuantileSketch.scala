package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic mergeable quantile sketch — the percentile analogue
  * of the q115 HLL shard rollup: per-shard partial STATES fold into
  * one global sketch by a second aggregate, so a federated
  * percentile-over-shards question never re-scans raw rows. Spark
  * exposes no mergeable percentile state at the SQL layer
  * (`approx_percentile` is one-shot), so this is the sanctioned
  * custom-`Aggregator` extension point (G16).
  *
  * Algorithm: the Manku-Rajagopalan-Lindsay compactor family with
  * DETERMINISTIC alternating-offset compaction (no RNG — the
  * [[Splits]] hash-randomness contract applies to everything this
  * engine calls "random"). State is a list of levels; level l holds
  * ≤ k sorted values each standing for 2^l originals. A full level
  * sorts, keeps alternate elements (offset alternating by level
  * parity, halving the bias of a fixed offset), and carries them one
  * level up. Worst-case rank error of a deterministic halving chain
  * is ≤ L·n/(2k) for L levels (each compaction at level l displaces
  * ranks by ≤ 2^(l−1), and ~n/(k·2^l) compactions happen there) —
  * with k = 512 and n = 10⁹ that is ~2% of n; the q202 gate asserts
  * a 5%-of-rank band against the exact percentile.
  *
  * Determinism note: single-sketch contents depend only on input
  * ORDER per partition; merged results depend on merge order, which
  * Spark does not fix — so the hashed surface is never the sketch
  * itself, only exact values + within-band booleans (the q48/q115
  * contract). The ε bound above holds under ANY merge order.
  *
  * Scale shape: executor state is O(k·log(n/k)) doubles per group;
  * the shuffle carries one such state per partition per group.
  * Nothing driver-side ever holds a data row.
  */
object QuantileSketch {

  /** (level0 fill count, level0 storage of fixed size k, higher
    * levels: element i holds weight-2^(i+1) sorted values). */
  type Buf = (Int, Array[Double], Array[Array[Double]])

  def emptyBuf(k: Int): Buf =
    (0, new Array[Double](k), Array.empty[Array[Double]])

  /** Keep alternate elements of a sorted even-length run — the
    * deterministic compaction. Offset alternates with the TARGET
    * level's parity so successive compactions cancel bias to first
    * order. */
  private def half(a: Array[Double], targetLvl: Int): Array[Double] = {
    // even by construction: k is even and merges of evens are even
    val out = new Array[Double](a.length / 2)
    val off = targetLvl % 2
    var i = 0
    while (i < out.length) { out(i) = a(2 * i + off); i += 1 }
    out
  }

  private def mergeSorted(a: Array[Double],
      b: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length + b.length)
    var i = 0; var j = 0; var o = 0
    while (i < a.length && j < b.length) {
      if (a(i) <= b(j)) { out(o) = a(i); i += 1 }
      else { out(o) = b(j); j += 1 }
      o += 1
    }
    while (i < a.length) { out(o) = a(i); i += 1; o += 1 }
    while (j < b.length) { out(o) = b(j); j += 1; o += 1 }
    out
  }

  /** Fold a sorted even-length run into level `lvl` (1-based),
    * cascading halving compactions upward while the level
    * overflows k. */
  private def addAtLevel(hi0: Array[Array[Double]], lvl0: Int,
      run0: Array[Double], k: Int): Array[Array[Double]] = {
    var hi = hi0
    var lvl = lvl0
    var run = run0
    while (run.nonEmpty) {
      if (hi.length < lvl)
        hi = hi ++ Array.fill(lvl - hi.length)(Array.empty[Double])
      val merged = mergeSorted(hi(lvl - 1), run)
      if (merged.length <= k) {
        hi(lvl - 1) = merged
        return hi
      }
      hi(lvl - 1) = Array.empty[Double]
      run = half(merged, lvl + 1)
      lvl += 1
    }
    hi
  }

  private def spillLevel0(b: Buf, k: Int): Buf = {
    val (c, l0, hi) = b
    if (c == 0) b
    else if (c == k) {
      val sorted = java.util.Arrays.copyOf(l0, k)
      java.util.Arrays.sort(sorted)
      (0, l0, addAtLevel(hi, 1, half(sorted, 1), k))
    } else b
  }

  def insert(b0: Buf, x: Double, k: Int): Buf = {
    val b = spillLevel0(b0, k)
    b._2(b._1) = x
    (b._1 + 1, b._2, b._3)
  }

  /** Merge another SERIALIZED state (level0 raw values first, then
    * weight-2^l levels) into the buffer. */
  def mergeState(b0: Buf, other: Seq[Seq[Double]], k: Int): Buf = {
    var b = b0
    if (other.nonEmpty) {
      other.head.foreach(x => b = insert(b, x, k))
      var l = 1
      while (l < other.length) {
        val run = other(l).toArray
        if (run.nonEmpty)
          b = (b._1, b._2, addAtLevel(b._3, l, run, k))
        l += 1
      }
    }
    b
  }

  /** Serialize the buffer: element 0 = level0 raw (weight 1, any
    * order), element l ≥ 1 = sorted weight-2^l values. */
  def toState(b: Buf): Seq[Seq[Double]] = {
    val (c, l0, hi) = b
    (java.util.Arrays.copyOf(l0, c).toSeq: Seq[Double]) +:
      hi.map(_.toSeq: Seq[Double]).toSeq
  }

  /** Estimated values at the given quantiles: weighted rank walk
    * over all (value, 2^l) pairs sorted by value. Empty sketch →
    * NaN per quantile. */
  def estimate(state: Seq[Seq[Double]], qs: Seq[Double]): Seq[Double] = {
    val pairs = state.zipWithIndex.flatMap { case (vs, l) =>
      val w = 1L << l
      vs.map(v => (v, w))
    }.sortBy(_._1).toArray
    val total = pairs.iterator.map(_._2).sum
    if (total == 0L) return qs.map(_ => Double.NaN)
    qs.map { q =>
      val target = math.max(1L, math.round(q * total))
      var cum = 0L
      var i = 0
      var res = pairs.last._1
      var done = false
      while (i < pairs.length && !done) {
        cum += pairs(i)._2
        if (cum >= target) { res = pairs(i)._1; done = true }
        i += 1
      }
      res
    }
  }

  /** Per-shard partial: values → serialized sketch state. */
  final class SketchAgg(k: Int)
      extends Aggregator[Double, Buf, Seq[Seq[Double]]] {
    require(k >= 2 && k % 2 == 0, s"k must be even and >= 2: $k")
    def zero: Buf = emptyBuf(k)
    def reduce(b: Buf, x: Double): Buf = insert(b, x, k)
    def merge(a: Buf, b: Buf): Buf = mergeState(a, toState(b), k)
    def finish(b: Buf): Seq[Seq[Double]] = toState(b)
    def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Seq[Seq[Double]]] =
      ExpressionEncoder[Seq[Seq[Double]]]()
  }

  /** Second-level rollup: shard STATES → merged sketch → quantile
    * estimates (one per requested quantile). */
  final class SketchMergeAgg(k: Int, qs: Seq[Double])
      extends Aggregator[Seq[Seq[Double]], Buf, Seq[Double]] {
    require(k >= 2 && k % 2 == 0, s"k must be even and >= 2: $k")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1]: $qs")
    def zero: Buf = emptyBuf(k)
    def reduce(b: Buf, s: Seq[Seq[Double]]): Buf = mergeState(b, s, k)
    def merge(a: Buf, b: Buf): Buf = mergeState(a, toState(b), k)
    def finish(b: Buf): Seq[Double] = estimate(toState(b), qs)
    def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }
}
