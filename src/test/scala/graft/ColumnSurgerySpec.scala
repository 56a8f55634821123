package graft

import org.apache.spark.sql.functions._

/** Nested-column surgery and map higher-order functions — the
  * schema-evolution column API (withField/dropFields rewrite a
  * nested struct in place, no explode/rebuild) and the map HOF
  * quartet. These complement q18-q23's array/JSON surface; map
  * iteration order is engine-internal, so assertions sort entries
  * before comparing (the same discipline an oracle would need).
  */
class ColumnSurgerySpec extends SparkSpec {
  import spark.implicits._

  test("withField adds and overwrites nested struct fields in place") {
    val df = Seq((1L, 2.0, 3.0)).toDF("id", "x", "y")
      .select(col("id"), struct(col("x"), col("y")).as("pt"))
    val got = df
      .withColumn("pt", col("pt")
        .withField("norm2", col("pt.x") * col("pt.x") +
          col("pt.y") * col("pt.y"))
        .withField("x", lit(20.0))) // overwrite
      .select("pt.x", "pt.y", "pt.norm2")
      .as[(Double, Double, Double)].head()
    assert(got == ((20.0, 3.0, 13.0)))
  }

  test("dropFields removes one nested field, keeps the rest") {
    val df = Seq(1L).toDF("id")
      .select(struct(lit(1).as("a"), lit(2).as("b"), lit(3).as("c"))
        .as("s"))
    val slim = df.select(col("s").dropFields("b").as("s"))
    assert(slim.select("s.*").columns.toSeq == Seq("a", "c"))
    assert(slim.select("s.a", "s.c").as[(Int, Int)].head() == ((1, 3)))
  }

  test("map HOFs: transform_keys/values, map_filter, map_zip_with") {
    val df = Seq(1).toDF("one").select(
      map(lit("a"), lit(1), lit("b"), lit(2), lit("c"), lit(30))
        .as("m"))
    def entries(c: org.apache.spark.sql.Column) =
      sort_array(map_entries(c))
    val got = df.select(
      entries(transform_keys(col("m"), (k, _) => upper(k))).as("up"),
      entries(transform_values(col("m"), (_, v) => v * 10)).as("x10"),
      entries(map_filter(col("m"), (_, v) => v < 10)).as("small"),
      entries(map_zip_with(col("m"), col("m"),
        (_, v1, v2) => v1 + v2)).as("dbl"))
    val r = got.selectExpr(
      "transform(up, e -> concat(e.key, ':', e.value))",
      "transform(x10, e -> concat(e.key, ':', e.value))",
      "transform(small, e -> concat(e.key, ':', e.value))",
      "transform(dbl, e -> concat(e.key, ':', e.value))")
      .as[(Seq[String], Seq[String], Seq[String], Seq[String])].head()
    assert(r._1 == Seq("A:1", "B:2", "C:30"))
    assert(r._2 == Seq("a:10", "b:20", "c:300"))
    assert(r._3 == Seq("a:1", "b:2"))
    assert(r._4 == Seq("a:2", "b:4", "c:60"))
  }
}
