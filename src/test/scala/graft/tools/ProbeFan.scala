package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (r15): does a derived md5-bucket filter get pushed
  * below a fanOut repartition (re-serializing it onto the single-task
  * scan), and what does each arrangement cost at sf0.1? */
object ProbeFan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    import graft.operators.Splits

    def time(label: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      }

    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))

    val direct = base
      .filter(Splits.hashBucket(col("l_orderkey")) < 15 &&
        col("l_linenumber") <= 3)
    val fanned = Tables.fanOut(
        base.filter(col("l_linenumber") <= 3))
      .filter(Splits.hashBucket(col("l_orderkey")) < 15)

    println("=== fanned plan ===")
    fanned.explain()
    time("direct filter at scan")(direct.count())
    time("fanOut then md5 filter")(fanned.count())

    val expDirect = graft.operators.Graph.coOccurrencePairs(
      direct, "l_orderkey", "l_partkey").select(col("src"), col("dst")).distinct()
    val expFanned = graft.operators.Graph.coOccurrencePairs(
      fanned, "l_orderkey", "l_partkey").select(col("src"), col("dst")).distinct()
    time("expansion direct")(expDirect.count())
    time("expansion fanned")(expFanned.count())
    spark.stop()
  }
}
