package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver testdata tables.
  *
  * Normalizations applied once here so every operator sees clean types:
  *  - `timestamp_ntz` parquet columns → session-TZ (UTC) `timestamp`, so
  *    date functions and the DuckDB oracle agree.
  *  - `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark only reads
  *    as a long (spark.sql.legacy.parquet.nanosAsLong=true). We convert
  *    nanos → micros with integer `div` (never `/`, which goes through
  *    double and loses precision above 2^53) and build a real timestamp.
  *    DuckDB's `CAST(ts AS TIMESTAMP)` truncates ns→us identically.
  *
  * At 100 TB these stay lazy scans: nothing here forces an action, and
  * column pruning / predicate pushdown flow through the `withColumn`s.
  */
object Tables {
  /** Session settings every graft SparkSession needs. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")

  /** Decouple CPU parallelism from scan splits: a NARROW source (a
    * single-row-group parquet file reads as ONE task regardless of
    * cores) serializes every per-row-expensive expression downstream
    * of it — shingle construction, decimal-exact aggregation, vector
    * math. Fan such sources out to the session default parallelism
    * first; identity when the input is already wide — which a 100 TB
    * table always is (thousands of row-group splits), so at scale
    * this never moves a byte. Call it AFTER filter + projection so
    * the local shuffle carries only the columns the consumer needs. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case "orders" =>
        raw.withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      case "lineitem" =>
        raw.withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** One verifiable engine capability: a DataFrame builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * `oracle=None` → the driver records a weaker rows-only check.
  */
final case class Qry(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
