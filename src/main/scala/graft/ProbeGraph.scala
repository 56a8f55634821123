package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe: compare edge-build strategies for the co-purchase
  * graph (q90/q94/q100/q103 all pay this) at sf0.1. */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      }

    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))

    // A: current shape — distinct, self-join, distinct
    def edgesJoin: DataFrame = {
      val d = li.distinct()
      d.as("a").join(d.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        .distinct()
    }

    // B: groupBy(ok) collect_set, map-side pair expansion, distinct
    def edgesSet: DataFrame = {
      val sets = li.groupBy(col("ok"))
        .agg(collect_set(col("pk")).as("ps"))
        .filter(size(col("ps")) > 1)
      sets.select(explode(col("ps")).as("src"), col("ps"))
        .select(col("src"), explode(col("ps")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    // C: like B but expand pairs with a HOF before one explode
    def edgesHof: DataFrame = {
      val sets = li.groupBy(col("ok"))
        .agg(collect_set(col("pk")).as("ps"))
        .filter(size(col("ps")) > 1)
      sets.select(explode(
          flatten(transform(col("ps"), x =>
            transform(filter(col("ps"), y => y =!= x),
              y => struct(x.as("src"), y.as("dst")))))).as("e"))
        .select(col("e.src"), col("e.dst"))
        .distinct()
    }

    val b = edgesSet
    time("B set-build count")(b.count())
    val e = b.select(col("src"), col("dst")).distinct()
    time("B+distinct")(e.count())
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e2 = e.join(broadcast(deg), "src")
    time("B+distinct+deg-join checkpoint") {
      val cp = e2.localCheckpoint(true); cp.count()
    }
    val cp = e2.localCheckpoint(true)
    var ranks = deg.select(col("src").as("id"), lit(1000000L).as("r"))
    time("3 broadcast rounds off checkpoint") {
      var rr = ranks
      for (_ <- 1 to 3)
        rr = cp.join(broadcast(rr), cp("src") === rr("id"))
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(85 * sc) div 100")).as("r"))
      rr.count()
    }
    time("B full pagerank")(
      operators.PageRank.integerRanks(edgesSet, "src", "dst", 3).count())
    spark.stop()
  }
}
