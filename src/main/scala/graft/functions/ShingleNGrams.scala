package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The shingle kernel as a standalone object so the generated code
  * can call it through the class's static forwarder
  * (`graft.functions.ShingleKernel.compute(...)`) — one JIT-compiled
  * method call per row instead of the interpreted higher-order
  * chain. */
object ShingleKernel {

  private val Sep = UTF8String.fromString(" ")

  /** Word n-gram shingles of a token array. Bit-equivalent to
    * `transform(sequence(0, size-n), i -> concat_ws(' ',
    * slice(toks, i+1, n)))` (+ `array_distinct` when `distinct`):
    * null elements are SKIPPED in the join exactly like concat_ws,
    * fewer-than-n tokens yield an empty array, and distinct keeps
    * first-occurrence order exactly like array_distinct. */
  def compute(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](len - n + 1)
    val seen =
      if (distinct) new java.util.HashSet[UTF8String](len * 2) else null
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        // getUTF8String returns null for null elements; concatWs
        // skips null inputs — matching concat_ws semantics
        parts(j) = arr.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(Sep, parts: _*)
      if (seen == null || seen.add(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native Catalyst expression building word n-gram shingles in one
  * tight kernel call — bit-equivalent to the HOF formulation in
  * [[graft.operators.Dedup.shingleSet]] /
  * [[graft.operators.Corpus.shingleList]] but without per-position
  * lambda dispatch, per-element Catalyst eval, or the intermediate
  * sequence/slice/product arrays (higher-order functions do not
  * participate in whole-stage codegen; profiling showed the
  * interpreted chain dominating every shingle-based query).
  *
  * The (b)-tier extension path from the build brief, same pattern as
  * [[VecDot]]. Registered as SQL `shingles(tokens, n, distinct)` by
  * [[graft.GraftExtensions]].
  */
case class ShingleNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"shingles expects (array<string>, n>=1), got " +
        s"${child.dataType.sql} with n=$n")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleNGrams = copy(child = newChild)
}
