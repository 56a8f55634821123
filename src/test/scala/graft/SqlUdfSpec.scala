package graft

/** Spark 4 SQL-defined functions (G16's declarative end): scalar and
  * table functions created in pure SQL — no JVM closure, so the body
  * INLINES into the plan and stays inside codegen, unlike a Scala
  * udf() black box.
  */
class SqlUdfSpec extends SparkSpec {

  test("SQL scalar UDF inlines its expression body into the plan") {
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION quality_band(q DOUBLE)
      RETURNS STRING
      RETURN CASE WHEN q >= 0.8 THEN 'high'
                  WHEN q >= 0.5 THEN 'mid'
                  ELSE 'low' END""")
    val df = spark.sql(
      "SELECT quality_band(x / 10.0) AS band " +
        "FROM VALUES (9.0), (6.0), (1.0) AS t(x)")
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("high", "mid", "low"))
    // over a literal source the inlined body CONSTANT-FOLDS away
    // entirely (a ScalaUDF black box never would): plan is a bare
    // pre-evaluated LocalTableScan
    val folded = df.queryExecution.executedPlan.toString
    assert(!folded.contains("ScalaUDF"), folded)
    assert(folded.trim.startsWith("LocalTableScan"),
      s"literal input should fold completely:\n$folded")
    // over a real scan the body appears as a plain CASE WHEN inside
    // the projection — still no eval barrier
    val scanned = spark.sql(
      s"""SELECT quality_band(l_discount * 10) AS band
         FROM parquet.`${sf()}/lineitem.parquet`""")
      .queryExecution.executedPlan.toString
    assert(!scanned.contains("ScalaUDF"), scanned)
    assert(scanned.contains("CASE WHEN"), s"body not inlined:\n$scanned")
  }

  test("SQL table function (RETURNS TABLE) expands like a relation") {
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION top_langs(min_docs INT)
      RETURNS TABLE (lang STRING, n BIGINT)
      RETURN SELECT lang, COUNT(*) AS n
             FROM parquet.`/root/testdata/sf0.001/documents.parquet`
             GROUP BY lang HAVING COUNT(*) >= min_docs""")
    val rows = spark.sql(
      "SELECT * FROM top_langs(1) ORDER BY n DESC, lang")
    assert(rows.count() > 0)
    val total = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(rows.agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0) == total)
  }

  test("SQL UDF composes with engine queries through the session catalog") {
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION mid3(s STRING)
      RETURNS STRING RETURN substr(s, 2, 3)""")
    val n = spark.sql(
      s"""SELECT COUNT(DISTINCT mid3(l_returnflag || l_linestatus))
         FROM parquet.`${sf()}/lineitem.parquet`""").head().getLong(0)
    assert(n > 0)
  }
}
