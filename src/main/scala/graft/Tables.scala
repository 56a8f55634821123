package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver testdata tables.
  *
  * Normalizations applied once here so every operator sees clean types:
  *  - `timestamp_ntz` parquet columns → session-TZ (UTC) `timestamp`, so
  *    date functions and the DuckDB oracle agree.
  *  - `events.ts` has shipped as TIMESTAMP(NANOS) (which Spark only
  *    reads as a long via spark.sql.legacy.parquet.nanosAsLong=true)
  *    in some testdata generations and TIMESTAMP(MICROS) in others, so
  *    the loader dispatches on the read schema: nanos-as-long converts
  *    with integer `div` (never `/`, which goes through double and
  *    loses precision above 2^53); micros just re-types NTZ → session
  *    TZ. DuckDB truncates/reads to microseconds identically.
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
    .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")

  /** Decouple CPU parallelism from scan splits: a NARROW source (a
    * single-row-group parquet file reads as ONE task regardless of
    * cores) serializes every per-row-expensive expression downstream
    * of it — shingle construction, decimal-exact aggregation, vector
    * math. Fan such sources out to the session default parallelism
    * first; identity when the input is already wide — which a 100 TB
    * table always is (thousands of row-group splits), so at scale
    * this never moves a byte. Call it AFTER filter + projection so
    * the local shuffle carries only the columns the consumer needs.
    *
    * Width is estimated from the FILE INDEX on the (eagerly-built)
    * analyzed plan — file count and total bytes over the row-group-
    * scale split size — never from `df.rdd`, which forces a full
    * physical planning pass outside the AQE-managed path on every
    * call. Byte-range splits below row-group size don't parallelize
    * parquet anyway, so files-and-bytes is the honest effective-task
    * bound. Non-file sources (in-memory test frames) carry no width
    * signal and pass through untouched.
    *
    * @param hintSplits caller-known effective source parallelism
    *        (e.g. a custom source's partition count); skips the
    *        file-index estimate entirely. */
  def fanOut(df: DataFrame, hintSplits: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val est: Option[Long] = hintSplits.map(_.toLong).orElse {
      val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
      val perScan = df.queryExecution.analyzed.collectLeaves().flatMap {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              val files = fs.location.inputFiles.length.toLong
              val bytes = fs.location.sizeInBytes
              Some(math.max(math.max(1L, files),
                (bytes + splitBytes - 1) / splitBytes))
            case _ => None
          }
        case _ => None
      }
      if (perScan.isEmpty) None else Some(perScan.sum)
    }
    est match {
      case Some(n) if n < target => df.repartition(target)
      case _ => df
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" =>
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case _ =>
            raw.withColumn("ts", col("ts").cast("timestamp"))
        }
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
