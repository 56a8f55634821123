package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranks

/** [[graft.operators.Ranks.parallelRank]] must equal the plain
  * window `row_number` on every row — the two-phase range-partition
  * + offset construction is an implementation of the same total
  * order, so any divergence (boundary row double-counted, offset off
  * by one, a group's slice misordered across partitions) is a wrong
  * rank somewhere. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int) = {
    // 3 named groups + a NULL group; heavy value ties (mod 97) so
    // partition boundaries land inside tie runs; id = unique break
    spark.range(n).select(
      when(col("id") % 4 === 0, lit("A"))
        .when(col("id") % 4 === 1, lit("B"))
        .when(col("id") % 4 === 2, lit("C"))
        .otherwise(lit(null: String)).as("g"),
      (col("id") % 97).as("v"),
      col("id"))
  }

  test("parallelRank == window row_number, incl. NULL group and tie runs") {
    val df = fixture(20000)
    val viaWindow = df.withColumn("rank",
      row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("rank"))
      .as[(Long, Long)].collect().toMap
    val viaParallel = Ranks.parallelRank(df, Seq("g"),
        Seq("v", "id"), "rank", numPartitions = 7)
      .select(col("id"), col("rank"))
      .as[(Long, Long)].collect().toMap
    assert(viaParallel.size === viaWindow.size)
    assert(viaParallel === viaWindow)
  }

  test("a group spanning every partition still ranks densely 1..n") {
    val df = spark.range(5000).select(lit("only").as("g"),
      (col("id") % 13).as("v"), col("id"))
    val ranks = Ranks.parallelRank(df, Seq("g"), Seq("v", "id"),
        "rank", numPartitions = 11)
      .select(col("rank")).as[Long].collect().sorted
    assert(ranks.toSeq === (1L to 5000L))
  }

  test("guards: existing output column, empty order cols") {
    val df = fixture(100).withColumnRenamed("v", "rank")
    intercept[IllegalArgumentException](
      Ranks.parallelRank(df, Seq("g"), Seq("id"), "rank"))
    intercept[IllegalArgumentException](
      Ranks.parallelRank(fixture(100), Seq("g"), Seq.empty, "r"))
  }

  test("empty input yields empty output with the rank column") {
    val out = Ranks.parallelRank(fixture(0), Seq("g"),
      Seq("v", "id"), "rank")
    assert(out.columns.contains("rank"))
    assert(out.count() === 0L)
  }
}
