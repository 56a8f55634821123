package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.B G16): custom `Aggregator`s for
  * semantics the built-in aggregates lack. These are the sanctioned
  * extension point below raw `mapPartitions` — they keep partial
  * aggregation (map-side combine) and fit `agg(...)`, so they scale
  * exactly like built-ins: one shuffle of small partial buffers.
  */
object Aggregators {

  /** Exact top-k smallest values per group, returned sorted — the
    * aggregator form of a per-group `ORDER BY ... LIMIT k` that
    * never materializes the group. Buffer is a bounded sorted list
    * (size ≤ k), so a billion-row group still ships k doubles. */
  final class TopKMin(k: Int)
      extends Aggregator[Double, List[Double], Seq[Double]] {
    require(k > 0)
    def zero: List[Double] = Nil
    def reduce(b: List[Double], x: Double): List[Double] =
      insert(b, x)
    def merge(a: List[Double], b: List[Double]): List[Double] =
      b.foldLeft(a)(insert)
    def finish(b: List[Double]): Seq[Double] = b
    private def insert(b: List[Double], x: Double): List[Double] = {
      if (b.lengthCompare(k) >= 0 && x >= b.last) b
      else ((x :: b).sorted).take(k)
    }
    def bufferEncoder: Encoder[List[Double]] =
      ExpressionEncoder[List[Double]]()
    def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Exact decimal-summing mean: Welford is unnecessary when sums
    * are kept exact; buffer is (scaled integer sum, count). Matches
    * the cross-engine-deterministic dsum/davg discipline of the
    * oracle queries at aggregate speed (long arithmetic, no
    * BigDecimal per row). `scale` = decimal places preserved. */
  final class ExactMean(scale: Int)
      extends Aggregator[Double, (Long, Long), Double] {
    private val f = math.pow(10, scale)
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), x: Double): (Long, Long) =
      (b._1 + math.round(x * f), b._2 + 1)
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Long, Long)): Double =
      if (b._2 == 0) 0d else (b._1 / f) / b._2.toDouble
    def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
