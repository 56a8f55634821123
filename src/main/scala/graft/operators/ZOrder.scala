package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) space-filling-curve keys for multi-dimensional
  * data layout.
  *
  * Sorting / range-partitioning a table by the interleaved key
  * clusters rows that are close in BOTH dimensions into the same
  * output file, so parquet footer min/max statistics prune scans on
  * EITHER column — the standard multi-dim data-skipping layout
  * (Delta/Iceberg OPTIMIZE ZORDER does exactly this). A plain sort
  * by (x, y) gives perfect x-skipping and useless y-skipping; the
  * curve bounds the bounding box of every contiguous key range in
  * both dims at once.
  *
  * At 100 TB this is a write-time layout choice:
  * `df.repartitionByRange(n, zorderKey).sortWithinPartitions(zorderKey)`
  * before the parquet sink — one range shuffle, no extra pass; the
  * read path needs no code at all (pruning falls out of footer
  * stats). The expressions below are pure integer bit arithmetic
  * (shift/and/or — whole-stage-codegen'd by Catalyst), shuffle-free.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at bit 2·i
    * (the classic parallel-prefix "bit interleave" ladder). Input is
    * masked to 16 bits; output occupies 32 even bit positions of a
    * long. */
  def spread16(c: Column): Column = {
    val a = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit coordinates: x occupies the even
    * bits, y the odd bits. Adjacent key ranges cover compact (x, y)
    * rectangles — the locality property q106 measures. */
  def interleave16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** General dims-way spread: bit i of `c` lands at bit dims·i.
    * [[spread16]]'s parallel-prefix ladder is the stride-2 fast
    * path; this explicit per-bit form handles any fan-out and is
    * still pure shift/and/or integer arithmetic inside whole-stage
    * codegen. Input is masked to `bits` bits. */
  def spreadBits(c: Column, dims: Int, bits: Int): Column = {
    require(dims >= 1 && bits >= 1 && dims * bits <= 63,
      s"need dims >= 1, bits >= 1, dims*bits <= 63; got dims=$dims bits=$bits")
    val a = c.cast("long").bitwiseAND(lit((1L << bits) - 1L))
    (0 until bits).map(i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), dims * i): Column)
      .reduce(_ bitwiseOR _)
  }

  /** N-dimensional Morton key: cols(k)'s bit i lands at bit
    * dims·i + k, so `interleave(Seq(x, y), 16)` reproduces
    * [[interleave16]] bit-for-bit and any extra column extends the
    * curve to another dimension. Fixing the top b bits of the key
    * pins EVERY dimension to a cell of width 2^(bits−⌈b/dims⌉-ish) —
    * the q132 audit measures exactly this bound in 3-D. Same
    * write-time recipe as 2-D: range-partition + sort by the key,
    * no read-path code. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "interleave needs at least one column")
    cols.zipWithIndex.map { case (c, k) =>
      shiftleft(spreadBits(c, cols.size, bits), k)
    }.reduce(_ bitwiseOR _)
  }

  /** 2-D Hilbert-curve index on the 2^bits grid — the native
    * [[graft.functions.Hilbert2D]] kernel (rotation state makes it
    * inexpressible as a shift/mask ladder). Same write recipe as the
    * Morton key, strictly better locality: consecutive indices are
    * grid-neighbors, so key-range reads touch contiguous cells with
    * no Morton seam jumps. Out-of-range coordinates → NULL. */
  def hilbert2d(x: Column, y: Column, bits: Int): Column =
    call_function("hilbert2d", x.cast("long"), y.cast("long"),
      lit(bits))

  /** N-dimensional Hilbert index ([[graft.functions.HilbertN]],
    * Skilling's transpose algorithm): `hilbertN(Seq(x, y), bits)`
    * reproduces [[hilbert2d]] bit-for-bit, and any extra column
    * extends the curve to another dimension (dims·bits ≤ 63) —
    * real lakehouse layouts cluster 3-4 columns, where Hilbert's
    * no-seam-jump locality beats the Morton [[interleave]] key on
    * the same write recipe. Out-of-range coordinates → NULL. */
  def hilbertN(cols: Seq[Column], bits: Int): Column =
    call_function("hilbertn",
      (lit(bits) +: cols.map(_.cast("long"))): _*)

  /** Inverse of [[graft.functions.HilbertN]] — Skilling's
    * TransposeToAxes direction, driver-side: the coordinates of a
    * curve index. Used by [[hilbertCoveringBuckets]] to turn a key
    * range back into a spatial cell; proven an exact inverse in
    * `HilbertSpec`. */
  def hilbertDecode(bits: Int, dims: Int, index: Long): Array[Long] = {
    require(dims >= 1 && bits >= 1 && dims * bits <= 63)
    // un-interleave: index bit dims*j + (dims-1-i) -> axis i bit j
    val x = new Array[Long](dims)
    var j = bits - 1
    var p = dims * bits - 1
    while (j >= 0) {
      var i = 0
      while (i < dims) {
        x(i) |= ((index >> p) & 1L) << j
        p -= 1
        i += 1
      }
      j -= 1
    }
    // Skilling: transpose -> axes
    val m = 1L << (bits - 1)
    var t = x(dims - 1) >> 1
    var i = dims - 1
    while (i >= 1) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    var q = 2L
    while (q != m * 2 && m > 1) {
      val pp = q - 1
      i = dims - 1
      while (i >= 0) {
        if ((x(i) & q) != 0) x(0) ^= pp
        else {
          t = (x(0) ^ x(i)) & pp
          x(0) ^= t; x(i) ^= t
        }
        i -= 1
      }
      q <<= 1
    }
    x
  }

  /** Read-path planning for a Hilbert-keyed layout: the bucket ids
    * whose spatial cell intersects an axis-aligned query box — the
    * partition-pruning list a lakehouse planner derives from the
    * CURVE, not from data. A bucket = the top dims·`bucketLevels`
    * index bits, which is one aligned curve subtree = one axis-
    * aligned cell of width 2^(bits−bucketLevels) per axis (decode
    * the subtree's first index, snap each coordinate down to the
    * cell grid). Filter `col("hbucket").isin(buckets…)` then prunes
    * partitions/files statically; every result row is still
    * verified by the residual predicate, so an over-approximation
    * can never corrupt results.
    * @param box per-dimension inclusive (lo, hi) */
  def hilbertCoveringBuckets(bits: Int, dims: Int, bucketLevels: Int,
      box: Seq[(Long, Long)]): Seq[Long] = {
    require(box.size == dims, s"box must have $dims (lo,hi) pairs")
    require(bucketLevels >= 1 && bucketLevels <= bits)
    val width = 1L << (bits - bucketLevels)
    val shift = dims * (bits - bucketLevels)
    (0L until (1L << (dims * bucketLevels))).filter { b =>
      val corner = hilbertDecode(bits, dims, b << shift)
      corner.indices.forall { i =>
        val lo = (corner(i) / width) * width
        val hi = lo + width - 1
        box(i)._1 <= hi && box(i)._2 >= lo
      }
    }
  }
}
