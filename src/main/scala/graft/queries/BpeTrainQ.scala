package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.BpeTrain

/** Distributed BPE merge learning (q190): the tokenizer-TRAINING
  * loop (Sennrich '16) as a corpus-scale relational program — pair
  * counting is the only exchange per round, merge application is
  * windows + equi-joins, and the whole 8-round learning trajectory
  * (winning pair, count, greedy leftmost application, re-indexing)
  * is replayed by the oracle round for round.
  */
object BpeTrainQ {

  private val Docs = 50L
  private val CharLimit = 60
  private val Rounds = 8

  val q190 = Qry(
    "q190_bpe_train",
    (s: SparkSession, d: String) => {
      val session = s
      import session.implicits._
      val toks0 = BpeTrain.charTokens(
        Tables.documents(s, d).filter(col("doc_id") < Docs),
        "doc_id", "text", CharLimit)
      val (merges, toksF) = BpeTrain.learnMerges(toks0, Rounds)
      val mergeRows = merges
        .map(m => (m.round, m.a, m.b, m.n))
        .toDF("round", "a", "b", "n")
      val stats = toksF.agg(
          countDistinct(col("tok")).as("nd"),
          count(lit(1)).as("nt"))
        .select(
          array(
            struct(lit(98).as("round"), lit("").as("a"),
              lit("").as("b"), col("nd").as("n")),
            struct(lit(99).as("round"), lit("").as("a"),
              lit("").as("b"), col("nt").as("n"))).as("rows"))
        .select(explode(col("rows")).as("r"))
        .select(col("r.round"), col("r.a"), col("r.b"), col("r.n"))
      mergeRows.unionByName(stats)
        .orderBy(col("round"), col("a"), col("b"))
    },
    Some {
      val rounds = (1 to Rounds).map { r =>
        val p = s"t${r - 1}"
        s"""pc$r AS MATERIALIZED (
          SELECT x.tok AS a, y.tok AS b, COUNT(*) AS n
          FROM $p x JOIN $p y
            ON y.doc = x.doc AND y.pos = x.pos + 1
          GROUP BY 1, 2),
        best$r AS MATERIALIZED (
          SELECT a, b, n FROM pc$r ORDER BY n DESC, a, b LIMIT 1),
        occ$r AS MATERIALIZED (
          SELECT x.doc, x.pos
          FROM $p x
          JOIN $p y ON y.doc = x.doc AND y.pos = x.pos + 1
          JOIN best$r s ON x.tok = s.a AND y.tok = s.b),
        sel$r AS MATERIALIZED (
          SELECT doc, pos FROM (
            SELECT doc, pos,
                   ROW_NUMBER() OVER (PARTITION BY doc, runid
                     ORDER BY pos) - 1 AS idx
            FROM (SELECT doc, pos,
                         pos - ROW_NUMBER() OVER (PARTITION BY doc
                           ORDER BY pos) AS runid
                  FROM occ$r))
          WHERE idx % 2 = 0),
        t$r AS MATERIALIZED (
          SELECT doc,
                 CAST(ROW_NUMBER() OVER (PARTITION BY doc
                   ORDER BY pos) AS BIGINT) AS pos,
                 tok
          FROM (
            SELECT x.doc, x.pos,
                   CASE WHEN m.pos IS NOT NULL
                        THEN (SELECT a || b FROM best$r)
                        ELSE x.tok END AS tok
            FROM $p x
            LEFT JOIN sel$r m
              ON m.doc = x.doc AND m.pos = x.pos
            LEFT JOIN sel$r dr
              ON dr.doc = x.doc AND dr.pos = x.pos - 1
            WHERE dr.pos IS NULL OR m.pos IS NOT NULL))"""
      }.mkString(",\n      ")
      val mergeOut = (1 to Rounds).map(r =>
        s"SELECT $r AS round, a, b, CAST(n AS BIGINT) AS n FROM best$r")
        .mkString("\n      UNION ALL ")
      s"""
      WITH t0 AS MATERIALIZED (
        SELECT doc, CAST(p AS BIGINT) AS pos,
               substring(t, CAST(p AS INT), 1) AS tok
        FROM (SELECT doc_id AS doc,
                     lower(substring(text, 1, $CharLimit)) AS t
              FROM documents WHERE doc_id < $Docs),
             unnest(generate_series(1, length(t))) s(p)),
      $rounds
      SELECT * FROM (
      $mergeOut
      UNION ALL SELECT 98, '', '',
        CAST(COUNT(DISTINCT tok) AS BIGINT) FROM t$Rounds
      UNION ALL SELECT 99, '', '',
        CAST(COUNT(*) AS BIGINT) FROM t$Rounds)
      ORDER BY round, a, b"""
    })

  val all: Seq[Qry] = Seq(q190)
}
