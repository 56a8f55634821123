package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Whole-registry physical-plan fingerprinter (dev/gate tool, not
  * driver contract): for EVERY SparkEntry query, render a
  * canonicalized shape string of the physical plan — node-name tree
  * plus the scale-relevant annotations (scan column/pushed-filter
  * counts, exchange partitioning kind, join strategy) — and its md5.
  * PlanShapeSpec locks ~30 shapes by hand; this covers the other
  * ~220 so UNINTENDED plan drift (a lost pushdown, a new Exchange, a
  * broadcast flipping to shuffle) breaks the round gate loudly the
  * way bench regressions already do.
  *
  * The shape string deliberately EXCLUDES expression ids, data
  * paths, statistics, rdd ids, and codegen ids — everything that
  * varies run-to-run or machine-to-machine — so the only diffs are
  * structural. Iterative operators (graph fixpoints) run their
  * per-round jobs while the plan is BUILT; their fingerprint is the
  * final checkpoint-scan plan plus whatever tail computation hangs
  * off it, which is exactly the part that could drift.
  *
  * Usage: runMain graft.PlanDigest [sfDir] [outJson]
  * Gate:  tools/plan_gate.sh (diff vs the committed PLANS_r{N}.json)
  */
object PlanDigest {

  def shapeOf(plan: SparkPlan): String = {
    def scanAnno(f: FileSourceScanExec): String = {
      val pushed = f.metadata.get("PushedFilters")
        .map(s => s.count(_ == ',') + (if (s.trim == "[]") 0 else 1))
        .getOrElse(0)
      val parts = f.metadata.get("PartitionFilters")
        .map(s => s.count(_ == ',') + (if (s.trim == "[]") 0 else 1))
        .getOrElse(0)
      s"[${f.requiredSchema.fields.length}c,${pushed}pf,${parts}pp]"
    }
    def rec(n: SparkPlan): String = {
      val label = n match {
        case f: FileSourceScanExec => s"${n.nodeName}${scanAnno(f)}"
        case e: ShuffleExchangeExec =>
          s"${n.nodeName}[${e.outputPartitioning.getClass.getSimpleName}]"
        case _ => n.nodeName
      }
      // strip codegen ids etc. from node names like "WholeStageCodegen (3)"
      val clean = label.replaceAll("\\s*\\(\\d+\\)", "")
      // AdaptiveSparkPlanExec is a leaf to TreeNode; fingerprint its
      // pre-runtime initialPlan (the deterministic part — the final
      // plan depends on runtime stats by design)
      val kids = (n match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => Seq(a.initialPlan)
        case _ => n.children
      }) ++ n.subqueries
      if (kids.isEmpty) clean
      else s"$clean(${kids.map(rec).mkString(",")})"
    }
    rec(plan)
  }

  /** md5 of a shape string — exposed so Bench can key pooled reps
    * by the same fingerprint the PLANS artifacts use. */
  def md5Of(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def md5(s: String): String = md5Of(s)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "PLANS.json"
    val spark = Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val shape =
          try shapeOf(fn(spark, sfDir).queryExecution.executedPlan)
          catch { case e: Throwable =>
            s"ERROR:${e.getClass.getSimpleName}" }
        (name, md5(shape), shape)
    }
    def q(s: String) = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    val json = rows.map { case (n, h, s) =>
      s"  ${q(n)}: {${q("digest")}: ${q(h)}, ${q("shape")}: ${q(s)}}"
    }.mkString("{\n", ",\n", "\n}\n")
    Files.write(Paths.get(out),
      json.getBytes(StandardCharsets.UTF_8))
    val errs = rows.filter(_._3.startsWith("ERROR:"))
    println(s"wrote ${rows.size} plan fingerprints -> $out" +
      (if (errs.nonEmpty)
        s" (${errs.size} ERRORS: ${errs.map(_._1).mkString(",")})"
      else ""))
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
