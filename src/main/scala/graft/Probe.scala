package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-dissection probe for slow queries; not part of the
  * driver contract. Times cumulative prefixes of a pipeline to find
  * where the seconds go. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      }
    }

    val docs = Tables.documents(spark, sfDir)
    time("scan text")(docs.select(col("text")).count())
    time("tokens")(docs.select(
      graft.operators.TextOps.tokens(col("text")).as("t")).count())
    val sh = docs.select(col("doc_id"),
      explode(graft.operators.Dedup.shingleSet(col("text"), 3)).as("g"))
    time("explode shingles")(sh.count())
    time("explode shingles after repartition(32)")(
      docs.repartition(32).select(col("doc_id"),
        explode(graft.operators.Dedup.shingleSet(col("text"), 3)).as("g"))
        .count())
    time("shingleList (no distinct) explode")(
      docs.select(col("doc_id"),
        explode(graft.operators.Corpus.shingleList(col("text"), 3)).as("g"))
        .count())
    time("groupBy g")(sh.groupBy("g").agg(count(lit(1))).count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    time("window df")(sh.withColumn("df", count(lit(1)).over(w)).count())
    time("window df + doc agg")(
      sh.withColumn("df", count(lit(1)).over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)), sum(when(col("df") >= 5, 1L).otherwise(0L)))
        .count())
    spark.stop()
  }
}
