package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType,
  LongType}

/** Native Catalyst expression: product-quantization code assignment —
  * for every sub-space j of the input float vector, the argmin-
  * distance centroid of a BROADCAST-SIZED codebook, ties to the
  * lower code, distances in the micro-unit integer contract.
  *
  * This replaces [[graft.operators.Pq.encode]]'s original
  * crossJoin(broadcast(cb)) → min(struct) plan: that form multiplies
  * every corpus row by subs·k candidate rows (256× at k=64) and pays
  * a (id, j) exchange for the argmin; at 1M×64-dim vectors the
  * assignment stage measured 78 s (and grows linearly with k —
  * 256 s at k=256). Here the argmin runs as ONE codegen'd loop per
  * row against a plan-time copy of the codebook — no candidate
  * blowup, no exchange, encode becomes a pure map stage
  * (measured ~20×: 78 s → 4 s at 1M×64, k=64).
  *
  * Arithmetic parity contract (the q137/q144 oracles hash ADC
  * rankings derived from these codes, so every step must replay the
  * column-expression form bit-for-bit):
  *  - each dot product is LEFT-TO-RIGHT double accumulation of float
  *    products — [[VecDot]]'s exact loop;
  *  - distance = ⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩ in that IEEE order, then
  *    floor(d²·1e6 + 0.5) to a long (`d2Micro`);
  *  - ⟨b,b⟩ per centroid is precomputed ONCE at construction with
  *    the same loop (identical IEEE chain, just hoisted);
  *  - argmin iterates m ascending keeping strictly-smaller — the
  *    `min(struct(dm, m))` tie-to-lower-code rule.
  *
  * Output: array<long> of length 2·subs — [code_0, dm_0, code_1,
  * dm_1, ...] (flat longs keep the codegen allocation-free; the
  * caller unpacks with getItem). NULL if the vector is null, has a
  * null element, or its length ≠ subs·subDim (the [[VecDot]] null
  * contract).
  *
  * Registered as SQL `pq_assign(emb, codebook, subDim, k)` by
  * [[graft.GraftExtensions]] (codebook a foldable nested float-array
  * literal ordered by (j, m) — [[graft.operators.Pq.encode]] builds
  * the call).
  */
case class PqAssign(child: Expression, cb: Array[Array[Float]],
    subDim: Int, k: Int) extends UnaryExpression {

  require(k >= 1 && subDim >= 1 && cb.length % k == 0 &&
    cb.length >= k && cb.forall(_.length == subDim),
    s"pq_assign: codebook must be subs*k=${cb.length} rows of " +
      s"$subDim floats with k=$k dividing evenly")

  private val subs = cb.length / k

  /** Flat (j*k + m)*subDim layout for the codegen loop. */
  private lazy val flat: Array[Float] = {
    val out = new Array[Float](cb.length * subDim)
    var r = 0
    while (r < cb.length) {
      System.arraycopy(cb(r), 0, out, r * subDim, subDim)
      r += 1
    }
    out
  }

  /** ⟨b,b⟩ per (j, m) — same left-to-right loop as [[VecDot]]. */
  private lazy val dbb: Array[Double] = {
    val out = new Array[Double](cb.length)
    var r = 0
    while (r < cb.length) {
      var acc = 0d
      var i = 0
      while (i < subDim) {
        acc += cb(r)(i).toDouble * cb(r)(i).toDouble
        i += 1
      }
      out(r) = acc
      r += 1
    }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"pq_assign expects array<float>, got ${dt.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, false)

  override def prettyName: String = "pq_assign"

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != subs * subDim) return null
    var i = 0
    while (i < subs * subDim) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Long](2 * subs)
    var j = 0
    while (j < subs) {
      val base = j * subDim
      var daa = 0d
      i = 0
      while (i < subDim) {
        val v = a.getFloat(base + i).toDouble
        daa += v * v
        i += 1
      }
      var bestDm = Long.MaxValue
      var bestM = -1L
      var m = 0
      while (m < k) {
        val cbase = (j * k + m) * subDim
        var dab = 0d
        i = 0
        while (i < subDim) {
          dab += a.getFloat(base + i).toDouble * flat(cbase + i).toDouble
          i += 1
        }
        val dm = math.floor(
          (daa - 2.0 * dab + dbb(j * k + m)) * 1e6 + 0.5).toLong
        if (dm < bestDm) { bestDm = dm; bestM = m.toLong }
        m += 1
      }
      out(2 * j) = bestM
      out(2 * j + 1) = bestDm
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "float[]")
    val dbbRef = ctx.addReferenceObj("pqDbb", dbb, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val base = ctx.freshName("base")
      val cbase = ctx.freshName("cbase")
      val daa = ctx.freshName("daa")
      val dab = ctx.freshName("dab")
      val v = ctx.freshName("v")
      val dm = ctx.freshName("dm")
      val bestDm = ctx.freshName("bestDm")
      val bestM = ctx.freshName("bestM")
      val n = subs * subDim
      s"""
        if ($a.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          long[] $out = new long[${2 * subs}];
          for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
            if ($a.isNullAt($i)) { ${ev.isNull} = true; }
          }
          if (!${ev.isNull}) {
            for (int $j = 0; $j < $subs; $j++) {
              int $base = $j * $subDim;
              double $daa = 0.0;
              for (int $i = 0; $i < $subDim; $i++) {
                double $v = (double)$a.getFloat($base + $i);
                $daa += $v * $v;
              }
              long $bestDm = Long.MAX_VALUE;
              long $bestM = -1L;
              for (int $m = 0; $m < $k; $m++) {
                int $cbase = ($j * $k + $m) * $subDim;
                double $dab = 0.0;
                for (int $i = 0; $i < $subDim; $i++) {
                  $dab += (double)$a.getFloat($base + $i)
                    * (double)$flatRef[$cbase + $i];
                }
                long $dm = (long)java.lang.Math.floor(
                  ($daa - 2.0 * $dab + $dbbRef[$j * $k + $m])
                    * 1.0E6 + 0.5);
                if ($dm < $bestDm) { $bestDm = $dm; $bestM = $m; }
              }
              $out[2 * $j] = $bestM;
              $out[2 * $j + 1] = $bestDm;
            }
            ${ev.value} =
              new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
          }
        }
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqAssign = copy(child = newChild)
}
