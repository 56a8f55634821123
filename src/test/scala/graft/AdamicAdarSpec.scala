package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Semantics of the ppm fixed-point ln ([[Graph.withLnPpm]]) and the
  * exact-integer Adamic-Adar candidate generator
  * ([[Graph.adamicAdarCandidates]], q254).
  *
  * The reference computations here are INDEPENDENT re-derivations in
  * plain Scala Long/BigInt arithmetic (not calls back into the
  * operator), so a regression in the SQL algebra cannot self-verify.
  */
class AdamicAdarSpec extends SparkSpec {
  import spark.implicits._

  /** Test-side reimplementation of the quantized ln spec:
    * d = m·2^sh + r, m ∈ [512, 1024),
    * lnPpm = table(m) + sh·693147 + floor(r·1e6 / (m·2^sh)). */
  private def lnPpmRef(d: Long): Long = {
    require(d >= 1)
    val bl = 63 - java.lang.Long.numberOfLeadingZeros(d)
    val sh = bl - 9
    val (m, r) =
      if (sh >= 0) (d >> sh, d - ((d >> sh) << sh))
      else (d << (-sh), 0L)
    val corr =
      if (sh > 0)
        (BigInt(r) * 1000000 / (BigInt(m) << sh)).toLong
      else 0L
    Graph.lnMantissaPpm((m - 512).toInt) + sh * 693147L + corr
  }

  private def lnPpmOf(ds: Seq[Long]): Map[Long, Long] =
    Graph.withLnPpm(ds.toDF("d"), "d", "lnppm")
      .select(col("d"), col("lnppm")).as[(Long, Long)]
      .collect().toMap

  test("lnPpm matches the independent reference bit-for-bit") {
    val ds = ((2L to 2100L) ++
      (10 to 62).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1)) ++
      Seq(999983L, 123456789L, 987654321012L, Long.MaxValue)).distinct
    val got = lnPpmOf(ds)
    ds.foreach(d => assert(got(d) === lnPpmRef(d), s"d=$d"))
  }

  test("lnPpm is within 8 ppm of true ln for d up to 2^40") {
    val ds = ((2L to 5000L) ++
      Seq(1L << 20, (1L << 20) + 7, 1L << 30, (1L << 40) - 3)).distinct
    val got = lnPpmOf(ds)
    ds.foreach { d =>
      val truePpm = StrictMath.log(d.toDouble) * 1e6
      assert(math.abs(got(d) - truePpm) <= 8.0,
        s"d=$d got=${got(d)} true=$truePpm")
    }
  }

  test("lnPpm on the mantissa range is the table value itself") {
    val got = lnPpmOf(512L to 1023L)
    (512L to 1023L).foreach(m =>
      assert(got(m) === Graph.lnMantissaPpm((m - 512).toInt)))
  }

  test("lnPpm is monotone non-decreasing across octave boundaries") {
    val ds = (2L to 4200L).toSeq
    val got = lnPpmOf(ds)
    ds.zip(ds.tail).foreach { case (a, b) =>
      assert(got(a) <= got(b), s"monotonicity broke at $a -> $b")
    }
  }

  /** Reference AA over an explicit undirected edge list: symmetrize,
    * degree, 2-hop candidates (no cap — the fixture stays under the
    * adaptive minimum of 64), drop adjacent pairs, sum the quantized
    * contributions. */
  private def aaRef(edges: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Long)] = {
    val adj = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val pairs = for {
      (w, ns) <- adj.toSeq
      u <- ns; v <- ns
      if u < v && !adj(u).contains(v)
    } yield ((u, v), w)
    pairs.groupBy(_._1).map { case (p, ws) =>
      val mids = ws.map(_._2)
      p -> (mids.size.toLong,
        mids.map(w => 1000000000000L / lnPpmRef(adj(w).size)).sum)
    }
  }

  test("adamicAdarCandidates matches the reference on a random graph") {
    val rnd = new scala.util.Random(254)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong,
      rnd.nextInt(60).toLong)).filter(e => e._1 != e._2).distinct
    val got = Graph.adamicAdarCandidates(
        edges.toDF("a", "b"), "a", "b")
      .select(col("u"), col("v"), col("cn"), col("aa_ppm"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(got === aaRef(edges))
  }

  test("AA ranks a low-degree shared neighbor above a hub midpoint") {
    // pair (1,2) shares one deg-2 midpoint; pair (3,4) shares one
    // midpoint of degree 8 — same cn, AA must prefer (1,2)
    val hub = 100L
    val spokes = (5L to 10L).flatMap(s => Seq((hub, s)))
    val edges = Seq((1L, 50L), (2L, 50L), (3L, hub), (4L, hub)) ++ spokes
    val got = Graph.adamicAdarCandidates(
        edges.toDF("a", "b"), "a", "b")
      .select(col("u"), col("v"), col("aa_ppm"))
      .as[(Long, Long, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(got((1L, 2L)) > got((3L, 4L)))
    // deg-2 midpoint: 1e12 div lnPpm(2) — check the exact value
    assert(got((1L, 2L)) === 1000000000000L / lnPpmRef(2L))
  }
}
