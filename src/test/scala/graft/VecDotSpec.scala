package graft

import org.apache.spark.sql.functions._
import graft.functions.VecDot
import graft.operators.Similarity

/** Native VecDot kernel + extension registration + optimizer rule. */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int): Seq[(Long, Array[Float],
      Array[Float])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong,
      Array.fill(dim)(rnd.nextFloat() * 2 - 1),
      Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  test("vec_dot SQL function registered via GraftExtensions") {
    val out = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(4 AS FLOAT), CAST(0.5 AS FLOAT)))")
      .as[Double].head()
    assert(out == 1.5 * 4 + 2 * 0.5)
  }

  test("VecDot matches the HOF fold bit-for-bit (eval + codegen)") {
    val df = randVecs(200, 64).toDF("id", "a", "b")
    val cmp = df.select(
      Similarity.dot($"a", $"b").as("hof"),
      call_function("vec_dot", $"a", $"b").as("native"))
      .as[(Double, Double)].collect()
    cmp.foreach { case (h, n) =>
      assert(java.lang.Double.doubleToLongBits(h) ==
        java.lang.Double.doubleToLongBits(n))
    }
  }

  test("VecDot matches HOF on unequal lengths and null elements") {
    // zip_with pads + null-poisons the fold → NULL; VecDot must agree
    val rows = spark.sql(
      """SELECT
           vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
                   array(CAST(1 AS FLOAT))) AS unequal,
           vec_dot(array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT)),
                   array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)))
             AS withnull""").collect()(0)
    assert(rows.isNullAt(0) && rows.isNullAt(1))
    val hof = spark.sql(
      """SELECT aggregate(zip_with(
           array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
           array(CAST(1 AS FLOAT)),
           (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
           CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").collect()(0)
    assert(hof.isNullAt(0)) // confirms the contract we mirror
  }

  test("VecDot null semantics: null array → null result") {
    val out = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), " +
        "array(CAST(1 AS FLOAT)))").collect()(0)
    assert(out.isNullAt(0))
  }

  test("VectorizeDotProduct rule rewrites the HOF pattern to VecDot") {
    // parquet-backed so ConvertToLocalRelation can't pre-evaluate
    val e = Tables.embeddings(spark, sf())
    val df = e.select($"vec_id",
      Similarity.dot($"embedding", $"embedding").as("d"))
    val optimized = df.queryExecution.optimizedPlan
    val hasVecDot = optimized.expressions.exists(expr =>
      expr.exists(_.isInstanceOf[VecDot]))
    assert(hasVecDot,
      s"expected VecDot in optimized plan:\n$optimized")
    // and the rewrite preserves values exactly (vs driver-side fold)
    val rows = e.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].head(5)
    val got = df.as[(Long, Double)].head(5).toMap
    rows.foreach { case (id, v) =>
      val want = v.foldLeft(0d)((s, x) => s + x.toDouble * x.toDouble)
      assert(got(id) == want)
    }
  }
}
