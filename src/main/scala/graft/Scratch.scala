package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe; not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = SparkEntry.entry(spark)
    e.show(30, truncate = false)
    println(s"entry rows = ${e.count()}")
    spark.stop()
  }
}
