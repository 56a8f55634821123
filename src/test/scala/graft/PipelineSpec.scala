package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quantize, Splits}

/** Property tests for the pipeline operators whose guarantees go
  * beyond what one oracle run shows: split determinism and bounds,
  * quantization error bounds and code ranges.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("hash split is a pure function of id: stable across partitionings") {
    val ids = (1L to 2000L).toDF("id")
    val a = ids.repartition(1)
      .select($"id", Splits.splitAssign($"id",
        Seq("train" -> 80, "val" -> 90, "test" -> 100)).as("s"))
      .as[(Long, String)].collect().toMap
    val b = ids.repartition(17)
      .select($"id", Splits.splitAssign($"id",
        Seq("train" -> 80, "val" -> 90, "test" -> 100)).as("s"))
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("hash split proportions land near the cutoffs on 2000 ids") {
    val ids = (1L to 2000L).toDF("id")
    val counts = ids.select(Splits.splitAssign($"id",
        Seq("train" -> 80, "val" -> 90, "test" -> 100)).as("s"))
      .groupBy($"s").count().as[(String, Long)].collect().toMap
    // md5 buckets are near-uniform; allow a generous tolerance
    assert(math.abs(counts("train") - 1600L) < 120,
      s"train=${counts("train")}")
    assert(math.abs(counts("val") - 200L) < 70, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 200L) < 70, s"test=${counts("test")}")
  }

  test("hash sample membership never changes as the dataset grows") {
    val small = (1L to 500L).toDF("id")
      .filter(Splits.hashSample($"id", 10)).as[Long].collect().toSet
    val large = (1L to 2000L).toDF("id")
      .filter(Splits.hashSample($"id", 10)).as[Long].collect().toSet
    assert(small.subsetOf(large))
    assert(large.filter(_ <= 500L) == small)
  }

  test("int8 quantization: codes bounded, error within half a step") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.99f)),
      (2L, Array(100f, -50f, 0f, 3.5f)),
      (3L, Array(0f, 0f, 0f, 0f)) // all-zero vector: scale 0
    ).toDF("id", "v")
    val out = vecs.select($"id", $"v",
        Quantize.absmaxScale($"v").as("scale"),
        Quantize.int8Codes($"v", Quantize.absmaxScale($"v")).as("q"))
      .select($"id", $"scale", $"q",
        Quantize.maxAbsError($"v", $"q", $"scale").as("err"))
      .as[(Long, Double, Seq[Int], Double)].collect()
      .map(r => r._1 -> r).toMap
    out.values.foreach { case (id, scale, q, err) =>
      assert(q.forall(c => c >= -127 && c <= 127), s"vec $id codes $q")
      // |dequant - x| <= scale/254 + float32 representation error
      assert(err <= scale / 254.0 + 1e-6, s"vec $id err $err scale $scale")
    }
    assert(out(3L)._3.forall(_ == 0) && out(3L)._4 == 0.0)
  }
}
