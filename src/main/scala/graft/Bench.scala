package graft

import org.apache.spark.sql.SparkSession

/** Bench harness: times every SparkEntry.queries entry on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A noop-format write
  * forces full materialization of every column (a bare count() would
  * let Catalyst prune the projections away and flatter the numbers).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle-partition ceiling. The default (= cores) is right for
    // the sf0.1 driver bench; at 100× that volume a 32-way shuffle
    // puts ~20M rows in every sort/agg partition and the externals
    // spill — size this to the data (AQE coalesces small shuffles
    // back down, so a high ceiling never hurts small queries).
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JIT/codegen/parquet-reader classloading so per-query
    // numbers measure the query, not first-touch JVM costs.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Run every query once at the smallest scale factor first: each
    // query's first-ever execution pays Janino whole-stage-codegen
    // compile + JIT warmup (measured 5+ s on the expression-heavy
    // queries — q57's minhash tree compiles ~5.7 s before running in
    // 2 s), which is JVM one-time cost, not query cost. Warming on
    // tiny data compiles the identical generated code, so the timed
    // runs below measure steady-state execution.
    val warmDir = {
      val parent = java.nio.file.Paths.get(sfDir).getParent
      val cand = if (parent == null) null else parent.resolve("sf0.001")
      if (cand != null && java.nio.file.Files.exists(cand)) cand.toString
      else sfDir
    }
    // Optional subset (comma-separated names) — e.g. the heavy
    // data-bound queries at a big scale factor.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
    picked.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }
    // Min of N reps: the minimum is the best estimator of a query's
    // intrinsic cost under machine contention noise (mean/max fold
    // scheduler jitter into the number).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val results = picked.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // progress to stderr so long runs are monitorable mid-flight
      System.err.println(
        s"[bench] $name ${times.map(t => f"$t%.2f").mkString("/")} s")
      name -> times
    }
    def r(v: Double) = math.round(v * 10000) / 10000.0
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r(v.min) }
      .mkString("{", ",", "}")
    val total = r(results.map(_._2.min).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // The driver captures only a bounded tail of stdout, which has
    // truncated per-query numbers in past rounds — so ALSO persist
    // the complete artifact (every rep, min, median, total) to a
    // stable file that gets committed with the round.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    val full = results.map { case (k, v) =>
      val sorted = v.sorted
      val med = if (reps % 2 == 1) sorted(reps / 2)
        else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2
      s""""$k":{"reps":[${v.map(r).mkString(",")}],"min":${r(v.min)},"median":${r(med)}}"""
    }.mkString(",\n  ")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","reps":$reps,"queries":{\n  $full\n}}\n""")
        .getBytes("UTF-8"))
    spark.stop()
  }
}
