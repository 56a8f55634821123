package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Hilbert-curve index of a point on
  * the 2^bits × 2^bits grid — the published iterative xy2d
  * convert-and-rotate loop (one quadrant decision + frame rotation
  * per bit level, most-significant first).
  *
  * Why next to [[graft.operators.ZOrder]]'s Morton key: both give the
  * bounded-bbox property that makes a curve-sorted file layout
  * prunable on either column from parquet footer stats, but Hilbert
  * additionally guarantees CONSECUTIVE indices are grid-NEIGHBORS
  * (Manhattan distance 1 — no Morton "seam jumps"), so range reads
  * along the key touch spatially contiguous data; the standard
  * lakehouse trade (slightly costlier key, strictly better locality).
  *
  * The rotation state makes each output bit-pair depend on ALL
  * higher-level decisions — inexpressible as a shift/mask ladder of
  * built-ins (Morton's form), hence a native kernel: the loop runs
  * codegen'd per row, `bits` a compile-time constant. Out-of-range or
  * negative coordinates yield NULL (inputs must be pre-bounded, e.g.
  * `% 1024` for bits = 10).
  *
  * Registered as SQL `hilbert2d(x, y, bits)` by
  * [[graft.GraftExtensions]]; Column API
  * [[graft.operators.ZOrder.hilbert2d]].
  */
case class Hilbert2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31,
    s"hilbert2d: bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert2d expects (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert2d"

  // out-of-range coordinates -> NULL
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    val n = 1L << bits
    if (x < 0 || y < 0 || x >= n || y >= n) return null
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val n = 1L << bits
      s"""
        long $x = $a;
        long $y = $b;
        long $d = 0L;
        if ($x < 0L || $y < 0L || $x >= ${n}L || $y >= ${n}L) {
          ${ev.isNull} = true;
        } else {
          for (long $s = ${n >> 1}L; $s > 0L; $s >>= 1) {
            long $rx = (($x & $s) > 0L) ? 1L : 0L;
            long $ry = (($y & $s) > 0L) ? 1L : 0L;
            $d += $s * $s * ((3L * $rx) ^ $ry);
            if ($ry == 0L) {
              if ($rx == 1L) { $x = ${n - 1}L - $x; $y = ${n - 1}L - $y; }
              long $t = $x; $x = $y; $y = $t;
            }
          }
        }
        ${ev.value} = $d;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hilbert2D =
    copy(left = newLeft, right = newRight)
}
