package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name prefixes for fast
    // local iteration on a subset (the driver always runs everything)
    val only: String => Boolean =
      if (args.length > 2) { val ps = args(2).split(',').toSeq
        name => ps.exists(name.startsWith)
      } else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // stale-state guard: outputs from a previous (possibly different-
    // subset) run in the same dir would let the checker validate a
    // mix of old and new results and still read green — start empty.
    // But refuse to wipe a directory that is neither empty nor a prior
    // verify run (no oracle_sql.json marker): with positional args a
    // swapped (sfDir, outDir) would otherwise silently and
    // irrecoverably delete real data.
    val outRoot = java.nio.file.Paths.get(outDir)
    if (java.nio.file.Files.exists(outRoot)) {
      import scala.jdk.CollectionConverters._
      val entries = java.nio.file.Files.list(outRoot).iterator().asScala.toSeq
      val isPriorRun =
        entries.isEmpty || java.nio.file.Files.exists(outRoot.resolve("oracle_sql.json"))
      if (!isPriorRun) {
        System.err.println(
          s"[verify] refusing to wipe $outDir: not empty and no " +
            "oracle_sql.json marker — is this really the output dir?")
        sys.exit(2)
      }
      java.nio.file.Files.walk(outRoot)
        .sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala
        .foreach(java.nio.file.Files.delete)
    }
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => only(kv._1)).foreach {
      case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => only(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
