package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (build brief: "skewed keys → salting or AQE
  * skew-join"). AQE handles skewed JOINS automatically; skewed
  * AGGREGATION keys still funnel into one reducer — `saltedAgg`
  * spreads each hot key over `salts` sub-keys, aggregates partials,
  * then combines. Algebraic aggregates only (sum/count/min/max) —
  * exactly the ones that decompose.
  *
  * The salt must be DETERMINISTIC (derived from row content, not
  * rand()) so retried tasks produce identical partials — a lost
  * executor must not change results.
  */
object Skew {

  /** Two-phase salted aggregation: sums and counts of `valueCol`
    * grouped by `keyCol`, with partials spread over `salts`
    * sub-keys derived from `saltSource` (any high-cardinality
    * column). Result == plain groupBy, whatever the key skew. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      saltSource: String, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(saltSource)),
        lit(salts.toLong)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        sum(round(col(valueCol), 2).cast("decimal(27,2)")).as("__psum"),
        count(lit(1)).as("__pcnt"),
        min(col(valueCol)).as("__pmin"),
        max(col(valueCol)).as("__pmax"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__psum")).cast("double").as("sum_value"),
        sum(col("__pcnt")).as("n"),
        min(col("__pmin")).as("min_value"),
        max(col("__pmax")).as("max_value"))

  /** Salted equi-join for a skewed fact key against a small-but-not-
    * broadcastable build side: the fact side gets a deterministic
    * salt in [0, salts), the build side is replicated once per salt
    * value, and the join key becomes (key, salt) — each hot key's
    * rows spread over `salts` reducers instead of funneling into
    * one. Result == the plain join. (AQE's skew-join split handles
    * sort-merge skew automatically; explicit salting is the portable
    * form, and the only one available inside a single stage at
    * 100 TB when a hot key exceeds one executor's memory.) */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
      saltSource: String, salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(salts.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
