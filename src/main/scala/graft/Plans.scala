package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for plan-shape review
  * (pushdown, pruning, broadcast, codegen spans). Not part of the
  * driver contract. Usage: runMain graft.Plans [queryName ...] */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSet
      else Set("q02_scan_filter", "q12_join_broadcast_star",
        "q13_join_sortmerge_facts", "q01_pricing_summary")
    SparkEntry.queries.filter(kv => names(kv._1)).foreach {
      case (name, fn) =>
        println(s"\n########## $name ##########")
        println(fn(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
