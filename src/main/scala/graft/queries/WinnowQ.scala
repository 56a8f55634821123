package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.Winnow

/** Winnowing fingerprints (q184): the MOSS-style local fingerprinting
  * scheme — the classic alternative to MinHash when POSITIONS matter
  * (plagiarism spans, license-text detection, contamination overlap
  * localisation). The oracle replays gram hashing, the packed
  * rightmost-min window, the algebraic decode, and the pair join.
  */
object WinnowQ {

  private val K = 8  // gram chars
  private val W = 4  // window grams (guarantee span = K + W - 1)
  private val MinShared = 25

  private def nibSql(e: String, i: Int): String =
    s"(strpos('0123456789abcdef', substr($e, $i, 1)) - 1)"

  /** First 6 hex digits of md5($e) as an integer (24-bit hash). */
  private def hex6Sql(e: String): String =
    "(" + (1 to 6).map(i =>
      s"${nibSql(s"md5($e)", i)} * ${1L << (4 * (6 - i))}")
      .mkString(" + ") + ")"

  /** q184 — winnowing fingerprints + overlap pairs ([[Winnow
    * .fingerprints]] / [[Winnow.overlapPairs]]): per-doc rows pin the
    * exact selected (position, hash) sets via count + a position-
    * weighted digest; pair rows report every doc pair sharing ≥ 25
    * distinct fingerprints (bounded: both legs filter doc_id < 80 —
    * at corpus scale the pair join stays an equi-join on the 24-bit
    * fingerprint hash, never all-pairs). */
  val q184 = Qry(
    "q184_winnow_fingerprints",
    (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 80)
        .select(col("doc_id"), col("text"))
      val fps = Winnow.fingerprints(docs, "doc_id", "text", K, W)
      val docLeg = fps
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("b"),
          sum(col("fp") * lit(131L) + col("pos")).as("c"))
        .select(lit("doc").as("kind"), col("doc_id").as("a"),
          col("b"), col("c"))
      val pairLeg = Winnow.overlapPairs(fps, "doc_id", MinShared)
        .select(lit("pair").as("kind"), col("d1").as("a"),
          col("d2").as("b"), col("shared").as("c"))
      docLeg.unionByName(pairLeg)
        .orderBy(col("kind"), col("a"), col("b"))
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 80),
      g AS (
        SELECT doc_id, CAST(p AS BIGINT) AS pos,
               CAST(${hex6Sql(s"substring(text, CAST(p AS INT), $K)")}
                 AS BIGINT) AS h
        FROM d, unnest(generate_series(1, length(text) - ${K - 1}))
               t(p)),
      mk AS (
        SELECT doc_id, pos,
               MIN(h * ${Winnow.PosPack} - pos) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN ${W - 1} PRECEDING AND CURRENT ROW)
                 AS mkey
        FROM g),
      fp AS (
        SELECT doc_id,
               (mkey + ${Winnow.PosPack - 1}) // ${Winnow.PosPack}
                 AS fp,
               ((mkey + ${Winnow.PosPack - 1}) // ${Winnow.PosPack})
                 * ${Winnow.PosPack} - mkey AS pos
        FROM (SELECT DISTINCT doc_id, mkey FROM mk WHERE pos >= $W)),
      docleg AS (
        SELECT 'doc' AS kind, doc_id AS a,
               CAST(COUNT(*) AS BIGINT) AS b,
               CAST(SUM(fp * 131 + pos) AS BIGINT) AS c
        FROM fp GROUP BY doc_id),
      pairleg AS (
        SELECT 'pair' AS kind, d1 AS a, d2 AS b,
               CAST(shared AS BIGINT) AS c
        FROM (
          SELECT x.doc_id AS d1, y.doc_id AS d2,
                 COUNT(DISTINCT x.fp) AS shared
          FROM fp x JOIN fp y
            ON x.fp = y.fp AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
        WHERE shared >= $MinShared)
      SELECT * FROM docleg
      UNION ALL SELECT * FROM pairleg
      ORDER BY kind, a, b"""))

  val all: Seq[Qry] = Seq(q184)
}
