package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC / NFD /
  * NFKC / NFKD) via `java.text.Normalizer`, as a codegen'd scalar —
  * the missing first step of a multilingual corpus-cleaning pass.
  * Two byte-different spellings of the same text (precomposed é
  * U+00E9 vs e + combining acute U+0301) defeat EXACT dedup (q27),
  * change shingles/minhashes, and split group-by keys; normalizing
  * the form before hashing makes canonically-equal strings
  * byte-equal.
  *
  * The b-tier extension pattern ([[VecDot]]/[[HilbertN]]): Spark has
  * no built-in for this, a Scala UDF would break whole-stage
  * codegen, and `java.text.Normalizer` is JDK-resident so executors
  * need no extra payload. The ASCII fast path skips normalization
  * entirely without leaving generated code (`UTF8String
  * .isFullAscii` — one vectorizable byte scan): on the dominant
  * all-ASCII shard the op costs one scan and ZERO allocation, so
  * composing it into every cleaning pass is free at 100 TB where it
  * doesn't apply and exact where it does.
  *
  * Form semantics are the Unicode standard ones (UAX #15): NFC for
  * storage/dedup canonicalization (DuckDB's `nfc_normalize` — the
  * oracle twin), NFKC when compatibility variants (ﬁ ligature,
  * full-width digits) must also collapse — the stronger fold an
  * LLM-corpus scrub usually wants before fingerprinting.
  *
  * Registered as SQL function `unicode_normalize(s, 'NFC')` by
  * [[graft.GraftExtensions]] (form must be a literal: it
  * parameterizes the generated code, and a per-row form would
  * defeat the static fast path).
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects a string, got ${dt.sql}")
    }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(
      input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = UnicodeNormalize.getClass.getName.stripSuffix("$")
    val f = s"java.text.Normalizer.Form.${form.name()}"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.normalize($c, $f);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {

  /** Shared eval/codegen kernel: ASCII fast path returns the input
    * buffer untouched; otherwise one isNormalized scan (already-NFC
    * non-ASCII text — the common case for clean UTF-8 corpora —
    * allocates only the java String), else normalize. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  def formOf(name: String): Normalizer.Form = name.toUpperCase match {
    case "NFC"  => Normalizer.Form.NFC
    case "NFD"  => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' " +
        "(expected NFC|NFD|NFKC|NFKD)")
  }
}
