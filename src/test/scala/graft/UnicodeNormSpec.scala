package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnicodeNormalize
import graft.operators.Curate

/** [[UnicodeNormalize]]: form semantics against java.text.Normalizer
  * ground truth, interpreted-vs-codegen parity, the ASCII/normalized
  * fast paths (same buffer back), SQL-surface argument validation,
  * and the composition contract — NFC/NFD twins exact-dedup together
  * through [[Curate.normalize]].
  */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private val pre = "caf\u00e9"          // precomposed
  private val dec = "cafe\u0301"         // e + combining acute
  private val liga = "\ufb01le"          // fi ligature (compat-folds)

  private def sqlNorm(s: String, form: String): String =
    Seq(Tuple1(s)).toDF("t")
      .selectExpr(s"unicode_normalize(t, '$form')")
      .as[String].collect().head

  test("NFC merges canonical twins; NFD splits them identically") {
    assert(sqlNorm(pre, "NFC") == sqlNorm(dec, "NFC"))
    assert(sqlNorm(pre, "NFD") == sqlNorm(dec, "NFD"))
    assert(sqlNorm(pre, "NFC") == pre && sqlNorm(pre, "NFD") == dec)
  }

  test("NFKC folds compatibility variants NFC leaves alone") {
    assert(sqlNorm(liga, "NFC") == liga)
    assert(sqlNorm(liga, "NFKC") == "file")
    assert(sqlNorm("\uff11\uff12\uff13", "NFKC") == "123") // full-width digits
  }

  test("matches java.text.Normalizer on mixed multilingual text " +
      "for every form, both eval paths") {
    val samples = Seq(pre, dec, liga, "", "plain ascii text",
      "\u2126\u03a9 a\u030angstrom \u00c5", "\u7684\u662f\u4e86 " + dec, "n\u0303 \u00f1")
    for (f <- Seq("NFC", "NFD", "NFKC", "NFKD"); s <- samples) {
      val want = Normalizer.normalize(s, Normalizer.Form.valueOf(f))
      assert(sqlNorm(s, f) == want, s"codegen path, form=$f")
      val ev = UnicodeNormalize.normalize(UTF8String.fromString(s),
        Normalizer.Form.valueOf(f)).toString
      assert(ev == want, s"kernel path, form=$f")
    }
  }

  test("ASCII and already-normalized inputs return the same buffer " +
      "(zero-allocation fast paths)") {
    val ascii = UTF8String.fromString("nothing exotic here")
    assert(UnicodeNormalize.normalize(ascii,
      Normalizer.Form.NFKC) eq ascii)
    val nfc = UTF8String.fromString(pre)
    assert(UnicodeNormalize.normalize(nfc, Normalizer.Form.NFC) eq nfc)
  }

  test("NULL in, NULL out; bad form / non-literal form / wrong " +
      "type are loud plan-time errors") {
    val df = Seq(Some(pre), None).toDF("t")
    assert(df.selectExpr("unicode_normalize(t, 'NFC')")
      .as[Option[String]].collect().toSet == Set(
        Some(pre), None))
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect()
    }
    intercept[Exception] {
      Seq(("x", "NFC")).toDF("t", "f")
        .selectExpr("unicode_normalize(t, f)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize(1, 'NFC')").collect()
    }
  }

  test("planted NFC/NFD twins exact-dedup together through " +
      "Curate.normalize (the q252 contract, API-level)") {
    val docs = Seq(
      (1L, s"the quick caf $pre special blend roast beans"),
      (2L, s"the quick caf $dec special blend roast beans"),
      (3L, "an unrelated document about spark plans entirely"))
      .toDF("doc_id", "text")
    val cleaned = docs.select(col("doc_id"),
      Curate.normalize(col("text")).as("clean"))
    assert(cleaned.select(countDistinct(col("clean")))
      .as[Long].head() == 2L)
    val survivors = Curate.curate(docs, "doc_id", "text",
      minQuality = 0.0, minJaccard = 0.99)
    assert(survivors.select(col("id")).as[Long].collect().toSet ==
      Set(1L, 3L)) // doc 2 is doc 1 after NFC
  }
}
