package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization (int8 absmax) — the storage/bandwidth
  * compression step of a large-scale embedding pipeline: each vector
  * is scaled by its own max |x| and rounded to [-127, 127] integers,
  * cutting float32 storage 4×. Pure per-row column expressions
  * (shuffle-free, codegen'd); rounding is `floor(x + 0.5)` — explicit
  * and engine-independent, unlike round() whose half-tie mode
  * differs across engines.
  */
object Quantize {

  /** Per-vector absmax scale (0.0 for an all-zero vector). */
  def absmaxScale(vec: Column): Column =
    coalesce(array_max(transform(vec, x => abs(x.cast("double")))),
      lit(0d))

  /** int8 codes: floor(x * 127 / scale + 0.5); all-zero vectors
    * quantize to all-zero codes. */
  def int8Codes(vec: Column, scale: Column): Column =
    when(scale === 0d,
      transform(vec, _ => lit(0).cast("int")))
      .otherwise(transform(vec,
        x => floor(x.cast("double") * 127d / scale + 0.5d).cast("int")))

  /** Max absolute reconstruction error |q * scale / 127 - x| over
    * the vector's dimensions. */
  def maxAbsError(vec: Column, codes: Column, scale: Column): Column =
    coalesce(
      array_max(zip_with(codes, vec,
        (q, x) => abs(q.cast("double") * scale / 127d -
          x.cast("double")))),
      lit(0d))
}
