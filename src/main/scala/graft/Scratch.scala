package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe; not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val shuffle = if (args.length > 1) args(1) else "32"
    val qname = if (args.length > 2) args(2) else "q75_data_quality"
    val spark = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(qname)(spark, sfDir)
    df.explain("formatted")
    spark.stop()
  }
}
