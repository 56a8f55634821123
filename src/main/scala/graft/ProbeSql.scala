package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe; not part of the driver contract: registers the
  * testdata tables as temp views and runs one ad-hoc SQL statement
  * (new-SQL-surface experiments — e.g. the recursive CTE probe —
  * without touching the library). Usage:
  *   runMain graft.ProbeSql <sfDir> "<sql>"
  */
object ProbeSql {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sql = args(1)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet").createTempView(t)
    val df = spark.sql(sql)
    df.show(50, truncate = false)
    df.explain("formatted")
    spark.stop()
  }
}
