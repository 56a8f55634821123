package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source/sink format coverage: the same frame round-trips through
  * every batch file format this Spark build ships (parquet, orc,
  * json, csv) with value fidelity. Text formats carry caveats the
  * engine has to own: JSON/CSV have no long-vs-double distinction
  * (schema must be supplied on read, as we do), and CSV cannot carry
  * nested/array columns at all. */
class FormatsSpec extends SparkSpec {

  private lazy val base: DataFrame =
    Tables.documents(spark, sf()).select(
      col("doc_id"), col("text"), col("lang"), col("n_chars"))

  private def roundTrip(fmt: String): DataFrame = {
    val dir = Files.createTempDirectory(s"graft-$fmt").toString
    base.write.mode("overwrite")
      .option("header", "true") // csv only; others ignore it
      .format(fmt).save(s"$dir/t")
    spark.read.schema(base.schema).option("header", "true")
      .format(fmt).load(s"$dir/t")
  }

  private def fingerprint(df: DataFrame): (Long, Long, Long) = {
    val r = df.agg(
      count(lit(1)),
      sum(col("doc_id")),
      sum(crc32(concat_ws("",
        col("doc_id"), col("text"), col("lang"), col("n_chars")))))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("parquet/orc/json round-trip with full value fidelity") {
    val want = fingerprint(base)
    Seq("parquet", "orc", "json").foreach { fmt =>
      assert(fingerprint(roundTrip(fmt)) == want, s"format $fmt")
    }
  }

  test("csv round-trips flat rows when quoting/escaping is on") {
    // default quote+escape handles embedded delimiters; the corpus
    // text has no newlines, so multiLine is not needed
    val got = roundTrip("csv").na.fill("", Seq("text"))
    // CSV writes empty string as missing -> restore before comparing
    assert(fingerprint(got) == fingerprint(base))
  }

  test("parquet schema evolution: mergeSchema unions old and new shards") {
    // The data-lake reality: yesterday's shards lack a column today's
    // writer added. mergeSchema=true reads both generations as one
    // table, nulling the missing column in old rows — schema-on-read
    // evolution with no rewrite of historical data.
    val dir = Files.createTempDirectory("graft-evolve").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/t/gen=1")
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "extra")
      .write.parquet(s"$dir/t/gen=2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/t")
    assert(merged.columns.sorted.toSeq == Seq("extra", "gen", "id", "v"))
    val rows = merged.select("id", "extra")
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, None), (2L, None),
      (3L, Some(30L)), (4L, Some(40L))))
    // and the partition column arrived as data
    assert(merged.filter(col("gen") === 1).count() == 2)
  }

  test("malformed JSON: PERMISSIVE quarantines to the corrupt column, clean rows survive") {
    // the production ingest contract: a bad record must never kill
    // the batch NOR silently vanish — it lands in _corrupt_record
    // for a quarantine sink while parsed rows flow through
    val dir = Files.createTempDirectory("graft-badjson").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.json"),
      Seq(
        """{"id": 1, "v": "ok"}""",
        """{"id": 2, "v": "also ok"}""",
        """{"id": 3, "v": BROKEN""",
        """not json at all""").mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, v STRING, _corrupt_record STRING")
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-column access requires the full row in memory
    assert(df.count() == 4)
    val clean = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(clean.count() == 2 && bad.count() == 2)
    assert(clean.select(sum(col("id"))).head().getLong(0) == 3L)
    df.unpersist()
  }

  test("malformed JSON: DROPMALFORMED skips, FAILFAST throws") {
    val dir = Files.createTempDirectory("graft-badjson2").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.json"),
      Seq("""{"id": 1}""", """broken""").mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id LONG")
    assert(spark.read.schema(schema).option("mode", "DROPMALFORMED")
      .json(dir).count() == 1)
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(schema).option("mode", "FAILFAST")
        .json(dir).collect()
    }
  }

  test("malformed CSV: PERMISSIVE nulls unparseable fields, corrupt column captures the line") {
    val dir = Files.createTempDirectory("graft-badcsv").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.csv"),
      Seq("1,10.5", "2,notanumber", "3,30.0")
        .mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, v DOUBLE, _corrupt_record STRING")
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    assert(df.count() == 3)
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getString(2) == "2,notanumber")
    df.unpersist()
  }

  test("csv refuses nested columns (documented engine caveat)") {
    val dir = Files.createTempDirectory("graft-csvbad").toString
    val nested = base.select(col("doc_id"),
      split(col("text"), " ").as("toks"))
    val e = intercept[Exception] {
      nested.write.mode("overwrite").csv(s"$dir/t")
    }
    assert(e.getMessage.toLowerCase.contains("csv") ||
      e.getMessage.toLowerCase.contains("unsupported"))
  }
}
