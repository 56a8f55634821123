package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.Curate
import Q._

/** The composed corpus-curation pipeline end-to-end (capstone of the
  * LLM-data-pipeline surface): documents + a shifted duplicate copy
  * → normalize → quality gate → exact dedup → LSH near-dup removal →
  * survivor stats. The oracle re-derives the whole pipeline in SQL
  * from the same shared fragments the per-stage oracles use, so a
  * drift in ANY stage fails the hash.
  */
object CurateQ {

  // clean-text versions of the DedupQ fragments ('text' → 'clean')
  private val cToks = DedupQ.toksSql.replace("text", "clean")
  private def cShingles(n: Int): String =
    DedupQ.shinglesSql(n).replace("text", "clean")

  val q57 = Qry(
    "q57_corpus_curate",
    (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"), col("lang"))
      // the copy gets one extra token: survives exact dedup, but
      // long docs (shingle set ≥ 9) are caught by the near-dup stage
      val doubled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", concat(col("text"), lit(" zzzextra"))))
      val survivors = Curate.curate(doubled, "doc_id", "text",
        minQuality = 0.5, n = 3, k = 6, bands = 3, minJaccard = 0.9)
      survivors
        .join(doubled.select(col("doc_id").as("id"), col("lang")),
          Seq("id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(dsum(col("quality"), 6), 6).as("sum_quality"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH doubled AS (
        SELECT doc_id, text, lang FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT doc_id + 1000000, text || ' zzzextra', lang
        FROM documents WHERE doc_id < 200),
      cleaned0 AS (
        SELECT doc_id AS id, lang,
               trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)),
                 '[0-9]+', '', 'g'), '\\s+', ' ', 'g')) AS clean
        FROM doubled),
      scored AS (
        SELECT id, lang, clean,
               ROUND(len(list_distinct($cToks)) * 1.0 / len($cToks)
                   * 0.4
                 + (1.0 - len(list_filter($cToks,
                     x -> list_contains(['the','a'], x))) * 1.0
                     / len($cToks)) * 0.3
                 + LEAST(len($cToks) / 100.0, 1.0) * 0.3, 6)
                 AS quality
        FROM cleaned0)
      , gated AS (
        SELECT * FROM scored WHERE quality >= 0.5),
      exact AS (
        SELECT * FROM (
          SELECT *, MIN(id) OVER (PARTITION BY md5(clean)) AS keep
          FROM gated) t
        WHERE id = keep),
      sh AS (
        SELECT id, ${cShingles(3)} AS shingles FROM exact),
      sigs AS (
        SELECT id, shingles, ${DedupQ.minhashSql(6)} AS sig FROM sh),
      banded AS (
        SELECT id, shingles,
               unnest(${DedupQ.bandKeysSql(3, 2)}) AS band_key
        FROM sigs),
      cand AS (
        SELECT l.id AS a, r.id AS b,
               FIRST(l.shingles) AS sh_a, FIRST(r.shingles) AS sh_b
        FROM banded l JOIN banded r ON l.band_key = r.band_key
        WHERE l.id < r.id GROUP BY l.id, r.id),
      drops AS (
        SELECT DISTINCT b AS id FROM cand
        WHERE ROUND(${DedupQ.jaccardSql}, 6) >= 0.9)
      SELECT lang,
             COUNT(*) AS n_docs,
             ROUND(${dsumSql("quality", 6)}, 6) AS sum_quality,
             MIN(id) AS min_id, MAX(id) AS max_id
      FROM exact
      WHERE id NOT IN (SELECT id FROM drops)
      GROUP BY lang ORDER BY lang"""))

  /** The best-quality near-dup policy end-to-end: the q61 chain
    * fixture (A, A+1 token, A+2 tokens — genuine transitive chains)
    * through [[Curate.curate]] with
    * [[Curate.NearDupPolicy.TransitiveBestQuality]], so each cluster
    * keeps its HIGHEST-quality member (ties → min id) instead of the
    * min id. Since the padded copies add unique tokens, the survivor
    * is usually NOT the min id — the policy is genuinely exercised
    * (a min-id bug would flip the id checksum). The oracle re-runs
    * the entire pipeline: normalize → quality → exact dedup → LSH
    * pair graph → recursive-CTE closure → per-component
    * quality-argmax window. */
  val q96 = Qry(
    "q96_curate_best",
    (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text"), col("lang"))
      val tripled = docs
        .unionByName(docs.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" qqx")).as("text"), col("lang")))
        .unionByName(docs.select(
          (col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" qqx qqy")).as("text"), col("lang")))
      val survivors = Curate.curate(tripled, "doc_id", "text",
        minQuality = 0.5, n = 3, k = 6, bands = 3, minJaccard = 0.93,
        policy = Curate.NearDupPolicy.TransitiveBestQuality)
      survivors
        .join(tripled.select(col("doc_id").as("id"), col("lang")),
          Seq("id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(dsum(col("quality"), 6), 6).as("sum_quality"),
          sum(col("id")).as("id_checksum"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH RECURSIVE tripled AS (
        SELECT doc_id, text, lang FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 1000000, text || ' qqx', lang
        FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 2000000, text || ' qqx qqy', lang
        FROM documents WHERE doc_id < 150),
      cleaned0 AS (
        SELECT doc_id AS id, lang,
               trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)),
                 '[0-9]+', '', 'g'), '\\s+', ' ', 'g')) AS clean
        FROM tripled),
      scored AS (
        SELECT id, lang, clean,
               ROUND(len(list_distinct($cToks)) * 1.0 / len($cToks)
                   * 0.4
                 + (1.0 - len(list_filter($cToks,
                     x -> list_contains(['the','a'], x))) * 1.0
                     / len($cToks)) * 0.3
                 + LEAST(len($cToks) / 100.0, 1.0) * 0.3, 6)
                 AS quality
        FROM cleaned0),
      gated AS (
        SELECT * FROM scored WHERE quality >= 0.5),
      exact AS (
        SELECT * FROM (
          SELECT *, MIN(id) OVER (PARTITION BY md5(clean)) AS keep
          FROM gated) t
        WHERE id = keep),
      sh AS (
        SELECT id, ${cShingles(3)} AS shingles FROM exact),
      sh2 AS (SELECT id, shingles FROM sh WHERE len(shingles) > 0),
      sigs AS (
        SELECT id, shingles, ${DedupQ.minhashSql(6)} AS sig FROM sh2),
      banded AS (
        SELECT id, shingles,
               unnest(${DedupQ.bandKeysSql(3, 2)}) AS band_key
        FROM sigs),
      cand AS (
        SELECT l.id AS a, r.id AS b,
               FIRST(l.shingles) AS sh_a, FIRST(r.shingles) AS sh_b
        FROM banded l JOIN banded r ON l.band_key = r.band_key
        WHERE l.id < r.id GROUP BY l.id, r.id),
      pairs AS (
        SELECT a, b FROM cand
        WHERE ROUND(${DedupQ.jaccardSql}, 6) >= 0.93),
      edges AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION SELECT b, a FROM pairs),
      walk AS (
        SELECT id, id AS label FROM exact
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
      assign AS (
        SELECT id, MIN(label) AS component FROM walk GROUP BY id),
      ranked AS (
        SELECT ex.id, ex.lang, ex.quality,
               ROW_NUMBER() OVER (PARTITION BY a.component
                 ORDER BY ex.quality DESC, ex.id) AS rk
        FROM exact ex JOIN assign a ON ex.id = a.id)
      SELECT lang, COUNT(*) AS n_docs,
             ROUND(${dsumSql("quality", 6)}, 6) AS sum_quality,
             CAST(SUM(id) AS BIGINT) AS id_checksum
      FROM ranked WHERE rk = 1
      GROUP BY lang ORDER BY lang"""))

  val all: Seq[Qry] = Seq(q57, q96)
}
