package graft

import org.apache.spark.sql.functions._
import graft.operators.{EntityRes, Geo}

/** Unit semantics for the q165/q168 linkage operators: blocked
  * entity resolution (transitive closure, blocking recall tradeoff,
  * exact-dup collapse) and grid-cell proximity join (brute-force
  * equivalence, cross-cell pairs, uniqueness).
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("entity resolution: transitive chain resolves to one entity") {
    // abcdefgh ~2~ abcdexxh ~2~ abcdexxx, ends at distance 3
    val recs = Seq(
      (1L, "abcdefgh"), (2L, "abcdexxh"), (3L, "abcdexxx"),
      (4L, "zzzzzzzz")).toDF("rec_id", "name")
    val out = EntityRes.resolve(recs, "rec_id", "name", 4, 2)
    val ents = out.select("name_id", "entity_id")
      .as[(Long, Long)].collect().toMap
    assert(ents(1L) === 1L && ents(2L) === 1L && ents(3L) === 1L)
    assert(ents(4L) === 4L)
  }

  test("entity resolution: different blocks never compare") {
    // distance 1 but prefixes differ → blocking keeps them apart
    val recs = Seq((1L, "abcd rod"), (2L, "abce rod"))
      .toDF("rec_id", "name")
    val out = EntityRes.resolve(recs, "rec_id", "name", 4, 2)
    assert(out.select("entity_id").distinct().count() === 2L)
  }

  test("entity resolution: exact duplicates collapse before fuzzy") {
    val recs = Seq((5L, "same name"), (9L, "same name"),
      (7L, "same namex")).toDF("rec_id", "name")
    val out = EntityRes.resolve(recs, "rec_id", "name", 4, 2)
      .orderBy("name_id")
    val rows = out.select("name", "name_id", "n_recs", "entity_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(("same name", 5L, 2L, 5L),
      ("same namex", 7L, 1L, 5L)))
  }

  test("proximity join matches brute force and reports each pair once") {
    val pts = (0L until 120L)
      .map(i => (i, (i * 37L + 11L) % 500L, (i * 91L + 3L) % 500L))
      .toDF("id", "x", "y")
    val fast = Geo.proximityPairs(pts, "id", "x", "y", 64L, 3600L)
      .select("a", "b", "d2").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    val rows = pts.as[(Long, Long, Long)].collect()
    val brute = (for {
      (a, ax, ay) <- rows; (b, bx, by) <- rows if a < b
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= 3600L
    } yield (a, b, d2)).toSeq.sorted
    assert(brute.nonEmpty, "fixture must produce pairs")
    assert(fast === brute)
    assert(fast.map(p => (p._1, p._2)).distinct.size === fast.size)
  }

  test("proximity join finds pairs straddling a cell boundary") {
    val pts = Seq((1L, 63L, 10L), (2L, 65L, 10L), (3L, 300L, 300L))
      .toDF("id", "x", "y")
    val out = Geo.proximityPairs(pts, "id", "x", "y", 64L, 3600L)
      .select("a", "b", "d2").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 4L)))
  }

  test("proximity join rejects a cell smaller than the radius") {
    val pts = Seq((1L, 0L, 0L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Geo.proximityPairs(pts, "id", "x", "y", 10L, 3600L)
    }
  }
}
