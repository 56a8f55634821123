package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** [[BloomJoin.bloomPrunedEquiJoin]]: result-identity with the plain
  * join (false positives only ever reach the exact join), the
  * might_contain filter actually sits on the fact side of the plan,
  * and degenerate inputs behave.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val fact = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0),
    (2L, 25.0), (99L, 1.0), (100L, 2.0))
    .toDF("fk", "amount")
  private val dim = Seq((2L, "a"), (3L, "b"), (7L, "c"))
    .toDF("dk", "name")

  test("bloom-pruned join returns exactly the plain join, " +
      "non-matching fact keys dropped") {
    val got = BloomJoin.bloomPrunedEquiJoin(fact, "fk", dim, "dk",
        expectedItems = 100L)
      .select("fk", "amount", "name")
      .as[(Long, Double, String)].collect().toSet
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "amount", "name")
      .as[(Long, Double, String)].collect().toSet
    assert(got === want)
    assert(got === Set((2L, 20.0, "a"), (2L, 25.0, "a"),
      (3L, 30.0, "b")))
  }

  test("the might_contain probe is a filter in the physical plan " +
      "(pre-join pruning, not post-join)") {
    val plan = BloomJoin.bloomPrunedEquiJoin(fact, "fk", dim, "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom probe missing from plan:\n$plan")
  }

  test("empty dim prunes everything; empty fact yields empty") {
    val emptyDim = dim.filter(col("dk") < 0L)
    assert(BloomJoin.bloomPrunedEquiJoin(fact, "fk", emptyDim, "dk")
      .count() === 0L)
    val emptyFact = fact.filter(col("fk") < 0L)
    assert(BloomJoin.bloomPrunedEquiJoin(emptyFact, "fk", dim, "dk")
      .count() === 0L)
  }

  test("no temp view leaks into the catalog, and the returned " +
      "frame stays executable regardless of catalog churn") {
    val before = spark.catalog.listTables().count()
    val df = BloomJoin.bloomPrunedEquiJoin(fact, "fk", dim, "dk")
    assert(spark.catalog.listTables().count() === before,
      "bloomPrunedEquiJoin registered a catalog entry")
    // A self-contained plan survives a hostile catalog reset.
    spark.catalog.clearCache()
    assert(df.count() === 3L)
    assert(df.count() === 3L) // and re-executes
  }

  test("undersized expectedItems degrades FPP, never correctness") {
    val bigDim = spark.range(500).selectExpr("id * 2 AS dk",
      "CAST(id AS STRING) AS name")
    val bigFact = spark.range(1000).selectExpr("id AS fk",
      "CAST(id AS DOUBLE) AS amount")
    val got = BloomJoin.bloomPrunedEquiJoin(bigFact, "fk", bigDim,
        "dk", expectedItems = 8L) // far too small on purpose
      .count()
    assert(got === 500L)
  }
}
