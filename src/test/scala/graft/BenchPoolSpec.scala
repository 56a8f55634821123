package graft

import java.nio.file.{Files, Path}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.scalatest.funsuite.AnyFunSuite

/** The digest-keyed bench pool merge ([[Bench.mergeInto]]): pooled
  * minima must come ONLY from reps whose plan digest matches the
  * incoming run's, legacy digestless reps must stay recorded but
  * never own a minimum, and a digest change must hand the minimum to
  * the new plan's reps. Pure JSON-level tests — no SparkSession.
  */
class BenchPoolSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def run(sf: String, qs: (String, Seq[Double], String)*)
      : ObjectNode = {
    val root = mapper.createObjectNode()
    root.put("metric", "total").put("unit", "sec").put("sf", sf)
    root.put("reps", 2)
    val qn = root.putObject("queries")
    qs.foreach { case (name, times, digest) =>
      val q = qn.putObject(name)
      val ra = q.putArray("reps"); times.foreach(ra.add)
      val la = q.putArray("loads"); times.foreach(_ => la.add(1.0))
      val da = q.putArray("digests"); times.foreach(_ => da.add(digest))
      q.put("digest", digest)
      q.put("min", times.min)
    }
    root
  }

  private def legacyPool(path: Path, sf: String,
      qs: (String, Seq[Double])*): Unit = {
    val root = mapper.createObjectNode()
    root.put("metric", "total").put("unit", "sec").put("sf", sf)
    root.put("runs", 5)
    val qn = root.putObject("queries")
    qs.foreach { case (name, times) =>
      val q = qn.putObject(name)
      val ra = q.putArray("reps"); times.foreach(ra.add)
      q.put("min", times.min)
    }
    Files.write(path, mapper.writeValueAsBytes(root))
  }

  private def read(path: Path): ObjectNode =
    mapper.readTree(Files.readAllBytes(path)).asInstanceOf[ObjectNode]

  test("legacy digestless reps are kept but cannot own the minimum") {
    val dir = Files.createTempDirectory("pool")
    val out = dir.resolve("pool.json")
    legacyPool(out, "sfX", "q1" -> Seq(0.2, 0.3)) // stale fast reps
    Bench.mergeInto(out.toString, "sfX",
      run("sfX", ("q1", Seq(0.5, 0.6), "digA")))
    val p = read(out).path("queries").path("q1")
    assert(p.path("min").asDouble() == 0.5)          // current plan
    assert(p.path("min_any_plan").asDouble() == 0.2) // diagnostic
    assert(p.path("reps").size() == 4)               // history kept
    assert(p.path("digest").asText() == "digA")
  }

  test("same-digest reps across runs pool their minima") {
    val dir = Files.createTempDirectory("pool")
    val out = dir.resolve("pool.json")
    Bench.mergeInto(out.toString, "sfX",
      run("sfX", ("q1", Seq(0.5, 0.6), "digA")))
    Bench.mergeInto(out.toString, "sfX",
      run("sfX", ("q1", Seq(0.4, 0.7), "digA")))
    val p = read(out).path("queries").path("q1")
    assert(p.path("min").asDouble() == 0.4)
    assert(read(out).path("runs").asInt() == 2)
  }

  test("a digest change hands the minimum to the new plan's reps") {
    val dir = Files.createTempDirectory("pool")
    val out = dir.resolve("pool.json")
    Bench.mergeInto(out.toString, "sfX",
      run("sfX", ("q1", Seq(0.2, 0.25), "digOld")))
    Bench.mergeInto(out.toString, "sfX",
      run("sfX", ("q1", Seq(0.5, 0.6), "digNew")))
    val p = read(out).path("queries").path("q1")
    assert(p.path("min").asDouble() == 0.5)          // not 0.2
    assert(p.path("min_any_plan").asDouble() == 0.2)
    assert(p.path("digest").asText() == "digNew")
  }

  test("ERR: pseudo-digests behave like legacy reps — never match, never own the min") {
    val dir = Files.createTempDirectory("pool")
    val out = dir.resolve("pool.json")
    // two different broken plans that failed fingerprinting the same
    // way must NOT pool: an ERR: key is not a plan identity
    Bench.mergeInto(out.toString, "sfX",
      run("sfX", ("q1", Seq(0.1, 0.15), "ERR:NullPointerException")))
    Bench.mergeInto(out.toString, "sfX",
      run("sfX", ("q1", Seq(0.5, 0.6), "ERR:NullPointerException")))
    val p = read(out).path("queries").path("q1")
    // no valid digest anywhere -> falls back to min_any_plan, the
    // legacy-pool behavior (recorded, but flagged by the ERR digest)
    assert(p.path("min").asDouble() == 0.1)
    assert(p.path("min_any_plan").asDouble() == 0.1)
    // once a VALID digest arrives, ERR reps can never own the min
    Bench.mergeInto(out.toString, "sfX",
      run("sfX", ("q1", Seq(0.4, 0.7), "digA")))
    val p2 = read(out).path("queries").path("q1")
    assert(p2.path("min").asDouble() == 0.4)          // not 0.1
    assert(p2.path("min_any_plan").asDouble() == 0.1) // diagnostic
    assert(p2.path("digest").asText() == "digA")
    assert(p2.path("reps").size() == 6)               // history kept
  }

  test("an ERR run arriving AFTER a valid pool keys the min on the " +
      "most recent valid digest — no silent min_any fallback") {
    val dir = Files.createTempDirectory("pool")
    val out = dir.resolve("pool.json")
    Bench.mergeInto(out.toString, "sfX",
      run("sfX", ("q1", Seq(0.4, 0.7), "digA")))
    // fingerprinting breaks on the next run; its fast reps came from
    // who-knows-what plan and must NOT own the pooled min
    Bench.mergeInto(out.toString, "sfX",
      run("sfX", ("q1", Seq(0.1, 0.15), "ERR:NullPointerException")))
    val p = read(out).path("queries").path("q1")
    assert(p.path("min").asDouble() == 0.4)           // digA-keyed
    assert(p.path("min_any_plan").asDouble() == 0.1)  // diagnostic
    // the ERR digest stays visible (the detection signal), and the
    // keying digest is recorded next to it
    assert(p.path("digest").asText().startsWith("ERR:"))
    assert(p.path("min_keyed_on").asText() == "digA")
  }

  test("a different-sf run lands in a side pool, not the existing one") {
    val dir = Files.createTempDirectory("pool")
    val out = dir.resolve("pool.json")
    Bench.mergeInto(out.toString, "/data/sfA",
      run("/data/sfA", ("q1", Seq(0.5), "digA")))
    Bench.mergeInto(out.toString, "/data/sfB",
      run("/data/sfB", ("q1", Seq(9.0), "digA")))
    assert(read(out).path("sf").asText() == "/data/sfA")
    assert(read(out).path("queries").path("q1").path("min")
      .asDouble() == 0.5)
    val side = dir.resolve("pool_sfB.json")
    assert(Files.exists(side))
    assert(read(side).path("queries").path("q1").path("min")
      .asDouble() == 9.0)
  }
}
