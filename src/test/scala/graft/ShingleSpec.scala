package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Bit-equivalence of the native ShingleNGrams kernel against the
  * higher-order-function formulation it replaced — same contract as
  * VecDotSpec for the dot kernel. The HOF reference is inlined here
  * (the operators now use the kernel). */
class ShingleSpec extends SparkSpec {
  import spark.implicits._

  /** The replaced HOF formulation, kept as the reference semantics. */
  private def hofShingles(text: org.apache.spark.sql.Column, n: Int,
      distinct: Boolean): org.apache.spark.sql.Column = {
    val toks = TextOps.tokens(text)
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    if (distinct) array_distinct(grams) else grams
  }

  private def kernel(text: org.apache.spark.sql.Column, n: Int,
      distinct: Boolean) =
    call_function("shingles", TextOps.tokens(text), lit(n),
      lit(distinct))

  test("kernel matches HOF formulation on the whole documents table") {
    for (n <- Seq(2, 3, 5); distinct <- Seq(true, false)) {
      val mismatches = Tables.documents(spark, sf())
        .select(col("doc_id"),
          kernel(col("text"), n, distinct).as("k"),
          hofShingles(col("text"), n, distinct).as("h"))
        .filter(col("k") =!= col("h"))
        .count()
      assert(mismatches == 0, s"n=$n distinct=$distinct")
    }
  }

  test("kernel edge cases: short docs, duplicates, first-occurrence order") {
    val rows = Seq(
      "a b a b a",      // dups: distinct keeps first-occurrence order
      "one two",        // fewer than n tokens -> empty
      "",               // no tokens -> empty
      "x x x x")        // all-identical shingles
      .toDF("text")
      .select(kernel(col("text"), 3, distinct = true).as("s"),
        kernel(col("text"), 3, distinct = false).as("m"))
      .as[(Seq[String], Seq[String])].collect()
    assert(rows(0)._1 == Seq("a b a", "b a b"))
    assert(rows(0)._2 == Seq("a b a", "b a b", "a b a"))
    assert(rows(1)._1.isEmpty && rows(2)._1.isEmpty)
    assert(rows(3)._1 == Seq("x x x"))
    assert(rows(3)._2 == Seq("x x x", "x x x"))
  }

  test("kernel skips null elements like concat_ws") {
    val df = Seq(1).toDF("i").select(
      call_function("shingles",
        array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")),
        lit(3), lit(false)).as("s"),
      transform(sequence(lit(0), lit(1)), i => concat_ws(" ",
        slice(array(lit("a"), lit(null).cast("string"), lit("b"),
          lit("c")), i + 1, lit(3)))).as("h"))
    val (s, h) = df.as[(Seq[String], Seq[String])].collect().head
    assert(s == h)
    assert(s == Seq("a b", "b c")) // null skipped in the join
  }

  test("null token array yields null, not empty") {
    val r = Seq(1).toDF("i")
      .select(call_function("shingles",
        lit(null).cast("array<string>"), lit(3), lit(true)).as("s"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("kernel expression participates in whole-stage codegen") {
    // child must itself be codegen-friendly (the tokens() filter HOF
    // is CodegenFallback and Generate refuses codegen above it) —
    // the kernel over a plain split() stays in the codegen'd Project
    val df = Tables.documents(spark, sf())
      .select(call_function("shingles",
        split(col("text"), "\\s+"), lit(3), lit(true)).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert("""\*\(\d+\) Project \[shingles""".r.findFirstIn(plan).isDefined,
      s"shingles Project not inside a codegen stage:\n$plan")
    assert(df.selectExpr("sum(size(s))").as[Long].collect().head > 0L)
  }

  test("SQL builder accepts int-valued literals, rejects columns/NULL clearly") {
    // a BIGINT literal for n is fine (SQL integer literals may widen)
    val ok = spark.sql(
      "SELECT shingles(array('a','b','c'), CAST(2 AS BIGINT), true) AS s")
      .selectExpr("size(s)").head().getInt(0)
    assert(ok == 2)
    // foldable expressions are fine (constant-folded to a value);
    // a genuinely non-constant n is a clear error, not a raw
    // eval()/cast crash
    val folded = spark.sql(
      "SELECT shingles(array('a','b','c'), length('xx'), true) AS s")
      .selectExpr("size(s)").head().getInt(0)
    assert(folded == 2)
    val e1 = intercept[Exception] {
      spark.sql(
        "SELECT shingles(array('a'), CAST(rand() * 2 AS INT), true)")
        .head()
    }
    assert(e1.getMessage.contains("must be a literal"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT shingles(array('a'), NULL, true)").head()
    }
    assert(e2.getMessage.contains("non-null"), e2.getMessage)
  }
}
