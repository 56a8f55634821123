package graft

import org.apache.spark.sql.functions._
import graft.operators.Winnow

/** Unit semantics for [[Winnow]] (q184): the winnowing guarantee
  * (shared span ≥ k+w−1 ⇒ shared fingerprint), hash/position
  * integrity of the packed-decode, density, short-document edges,
  * and the overlap join.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val W = 4

  private def fps(docs: Seq[(Long, String)]) =
    Winnow.fingerprints(docs.toDF("doc_id", "text"), "doc_id",
      "text", K, W)

  test("selected fingerprints decode to real (pos, hash) gram pairs") {
    val text = "the quick brown fox jumps over the lazy dog again"
    val rows = fps(Seq((1L, text)))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, pos, fp) =>
      assert(pos >= 1 && pos <= text.length - K + 1)
      val gram = text.substring(pos.toInt - 1, pos.toInt - 1 + K)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(fp === java.lang.Long.parseLong(md5.take(6), 16),
        s"fp mismatch at pos $pos gram '$gram'")
    }
  }

  test("winnowing guarantee: shared span of k+w-1 chars shares a fingerprint") {
    // two otherwise-different docs embedding the same 16-char span
    val span = "COMMONSPAN16CHRS"
    val a = s"aaaaaaaaaaaaaaaaaaaa${span}bbbbbbbbbbbbbbbbbbbb"
    val b = s"cccccccccccccccccccc${span}dddddddddddddddddddd"
    val f = fps(Seq((1L, a), (2L, b)))
    val shared = f.filter(col("doc_id") === 1).select("fp")
      .intersect(f.filter(col("doc_id") === 2).select("fp"))
    assert(shared.count() >= 1)
  }

  test("density: roughly 2/(w+1) of grams survive, never more than all") {
    val text = ('a' to 'z').mkString * 20 // 520 chars, all grams distinct
    val n = fps(Seq((1L, text))).count()
    val grams = text.length - K + 1
    assert(n <= grams)
    // winnowing density expectation ~2/(w+1); allow generous slack
    assert(n >= grams / (2 * W) && n <= grams * 2 / (W - 1))
  }

  test("documents shorter than k produce no grams; shorter than k+w-1 no full window") {
    assert(fps(Seq((1L, "tiny"))).count() === 0)
    // k ≤ len < k+w-1: grams exist but no full window of w grams
    assert(fps(Seq((2L, "exactly9ch"))).count() === 0)
  }

  test("identical docs share everything; overlapPairs honors minShared") {
    val text = "the quick brown fox jumps over the lazy dog again " * 3
    val f = fps(Seq((1L, text), (2L, text), (3L, "zZ" * 40)))
    // overlap counts DISTINCT hashes; the repeated text selects the
    // same hash at several positions, so dedup before comparing
    val nf = f.filter(col("doc_id") === 1).select("fp")
      .distinct().count()
    val pairs = Winnow.overlapPairs(f, "doc_id", minShared = 1)
      .as[(Long, Long, Long)].collect().toList
    val p12 = pairs.find(p => p._1 == 1 && p._2 == 2)
    assert(p12.exists(_._3 === nf))
    // doc 3 shares nothing with 1/2
    assert(!pairs.exists(p => p._2 == 3 || p._1 == 3))
    // raising the bar above the overlap drops the pair
    assert(Winnow.overlapPairs(f, "doc_id", minShared = nf.toInt + 1)
      .count() === 0)
  }
}
