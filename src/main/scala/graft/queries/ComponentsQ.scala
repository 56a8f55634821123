package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.{Components, Dedup}

/** Transitive near-dup clustering (the connected-components upgrade
  * to greedy pairwise dedup). The fixture manufactures genuine
  * transitive chains: for each document A, a copy B = A + 1 extra
  * token and a copy C = A + 2 extra tokens. With shingle n=3 and
  * token count m, J(A,B) = (m-2)/(m-1), J(B,C) = (m-1)/m, but
  * J(A,C) = (m-2)/m — so at threshold 0.93 every doc with
  * 16 ≤ m ≤ 28 forms a real chain (A≈B, B≈C, A≉C) that only
  * transitive closure clusters correctly. The oracle re-derives the
  * identical LSH pair graph from the shared SQL fragments, then
  * closes it with a recursive CTE.
  */
object ComponentsQ {

  private val N = 3
  private val K = 6
  private val BANDS = 3
  private val MinJ = 0.93

  val q61 = Qry(
    "q61_neardup_components",
    (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text"))
      val tripled = docs
        .unionByName(docs.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" qq0")).as("text")))
        .unionByName(docs.select(
          (col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" qq0 qq1")).as("text")))
      val pairs = Dedup.lshNearDupPairs(tripled, "doc_id", "text",
        n = N, k = K, bands = BANDS, minJaccard = MinJ)
      Components.connectedComponents(tripled, "doc_id",
          pairs, "a", "b")
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_docs"), max(col("id")).as("max_id"))
        .orderBy(col("component"))
    },
    Some(s"""
      WITH RECURSIVE tripled AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 1000000, text || ' qq0'
        FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 2000000, text || ' qq0 qq1'
        FROM documents WHERE doc_id < 150),
      sh AS (
        SELECT doc_id AS id, ${DedupQ.shinglesSql(N)} AS shingles
        FROM tripled),
      sh2 AS (SELECT id, shingles FROM sh WHERE len(shingles) > 0),
      sigs AS (
        SELECT id, shingles, ${DedupQ.minhashSql(K)} AS sig FROM sh2),
      banded AS (
        SELECT id, shingles,
               unnest(${DedupQ.bandKeysSql(BANDS, K / BANDS)}) AS band_key
        FROM sigs),
      cand AS (
        SELECT l.id AS a, r.id AS b,
               FIRST(l.shingles) AS sh_a, FIRST(r.shingles) AS sh_b
        FROM banded l JOIN banded r ON l.band_key = r.band_key
        WHERE l.id < r.id GROUP BY l.id, r.id),
      pairs AS (
        SELECT a, b FROM cand
        WHERE ROUND(${DedupQ.jaccardSql}, 6) >= $MinJ),
      edges AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION SELECT b, a FROM pairs),
      walk AS (
        SELECT doc_id AS id, doc_id AS label FROM tripled
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
      assign AS (
        SELECT id, MIN(label) AS component FROM walk GROUP BY id)
      SELECT component, COUNT(*) AS n_docs, MAX(id) AS max_id
      FROM assign GROUP BY component ORDER BY component"""))

  val all: Seq[Qry] = Seq(q61)
}
