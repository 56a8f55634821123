package graft

import org.apache.spark.sql.functions._

/** Independent verification of q101's SemDeDup-style semantic dedup:
  * the query's per-cluster report is re-derived from scratch on the
  * driver (brute-force cosines over the collected bounded subset),
  * and the keep-min-id survivor properties are asserted directly.
  */
class SemanticDedupSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private lazy val report =
    queries.Stats.q101.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  /** (vec_id, cid) assignment re-derived exactly as q92 defines it,
    * plus the raw vectors, all collected (bounded subset ≤ 300). */
  private lazy val assigned: Seq[(Long, Long, Array[Float])] = {
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cents = e.filter(_._1 < 8)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    e.filter(_._1 < 300).map { case (id, v) =>
      val cid = cents.map { case (c, cv) =>
        (dot(v, v) - 2.0 * dot(v, cv) + dot(cv, cv), c)
      }.min._2
      (id, cid, v)
    }.toSeq
  }

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def cos6(a: Array[Float], b: Array[Float]): Double = {
    val c = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    math.floor(c * 1e6 + (if (c >= 0) 0.5 else -0.5)) / 1e6
  }

  /** Driver-side replay of the dedup rule: drop v iff a lower-id
    * same-cluster vector is within the threshold. */
  private lazy val expectDropped: Set[Long] = {
    val byCluster = assigned.groupBy(_._2)
    byCluster.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      for {
        (b, _, vb) <- sorted
        if sorted.exists { case (a, _, va) =>
          a < b && cos6(va, vb) >= 0.35 }
      } yield b
    }.toSet
  }

  test("per-cluster member and dropped counts match a from-scratch replay") {
    val byCluster = assigned.groupBy(_._2)
    val expect = byCluster.map { case (cid, ms) =>
      val ids = ms.map(_._1).toSet
      (cid, (ms.size.toLong, ids.count(expectDropped).toLong,
        (ids -- expectDropped).sum))
    }
    assert(report.nonEmpty)
    report.foreach { case (cid, n, dropped, checksum) =>
      val (en, ed, ec) = expect(cid)
      assert(n == en, s"cluster $cid members")
      assert(dropped == ed, s"cluster $cid dropped")
      assert(checksum == ec, s"cluster $cid survivor checksum")
    }
    assert(report.map(_._1).toSet == expect.keySet)
  }

  test("something is actually deduplicated at the 0.35 threshold") {
    assert(report.map(_._3).sum > 0)
  }

  test("the minimum id of every cluster always survives") {
    val minIds = assigned.groupBy(_._2).values.map(_.map(_._1).min)
    minIds.foreach(id => assert(!expectDropped(id)))
  }
}
