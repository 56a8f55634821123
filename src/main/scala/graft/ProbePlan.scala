package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev probe (not library surface): print one query's formatted plan
  * with size-based auto-broadcast disabled — the at-scale join-shape
  * view PlanShapeSpec asserts against.
  * Usage: runMain graft.ProbePlan <sfDir> <qname> */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    println(SparkEntry.queries(args(1))(spark, args(0))
      .queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
