package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.{Corpus, TextOps}

/** Retrieval-prep surface: q192 exercises [[Corpus.chunkTokens]]'s
  * COVERAGE GUARANTEE — with chunk size 64 / overlap 16 (stride 48),
  * every span of ≤ overlap+1 = 17 consecutive tokens lies wholly
  * inside at least one chunk, so a RAG answer span that short can
  * never straddle retrieval units unseen. The query materializes the
  * chunk windows, probes them with deterministic 17-token spans
  * (every 13th start position), and reports per-document span
  * coverage (min_cover ≥ 1 IS the guarantee; the proof for arbitrary
  * inputs is spec-pinned in ChunkDriftSpec).
  *
  * Deliberately distinct from q91_chunk_overlap, which hash-pins the
  * raw fixed-stride window TEXT (including trailing suffix windows):
  * this one verifies the retrieval PROPERTY of the operator form
  * (no-suffix rule, offsets) that downstream embed/index stages
  * consume.
  *
  * Scale shape: chunks and probe spans both derive map-side from the
  * same documents scan; the containment join is an equi-join on
  * doc_id (co-partitioned, per-doc fan-out bounded by
  * chunks/doc × spans/doc), then two bins-sized aggregations.
  */
object RagQ {

  private val Size = 64
  private val Overlap = 16
  private val Stride = Size - Overlap
  private val SpanLen = Overlap + 1 // longest guaranteed-covered span
  private val SpanStep = 13

  val q192 = Qry(
    "q192_chunk_coverage",
    (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val chunks = Corpus.chunkTokens(docs, "doc_id", "text",
          Size, Overlap)
        .select(col("doc_id"), col("tok_start"), col("n_tok"))
      val spans = docs
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("ntok"))
        .filter(col("ntok") >= SpanLen)
        .select(col("doc_id"), explode(sequence(lit(0L),
          col("ntok") - lit(SpanLen.toLong), lit(SpanStep.toLong)))
          .as("j"))
      spans.join(chunks, Seq("doc_id"))
        .filter(col("tok_start") <= col("j") &&
          col("j") + lit(SpanLen.toLong) <=
            col("tok_start") + col("n_tok"))
        .groupBy(col("doc_id"), col("j"))
        .agg(count(lit(1)).as("n_cover"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          min(col("n_cover")).as("min_cover"),
          max(col("n_cover")).as("max_cover"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                 x -> x <> '') AS tk
        FROM documents),
      n AS (
        SELECT doc_id, CAST(len(tk) AS BIGINT) AS ntok
        FROM toks WHERE len(tk) > 0),
      chunks AS (
        SELECT doc_id, CAST(i AS BIGINT) * $Stride AS tok_start,
               least($Size, ntok - CAST(i AS BIGINT) * $Stride)
                 AS n_tok
        FROM n, unnest(generate_series(0,
          CAST((greatest(ntok - $Size, 0) + ${Stride - 1}) // $Stride
            AS BIGINT))) s(i)),
      spans AS (
        SELECT doc_id, CAST(j AS BIGINT) AS j
        FROM n, unnest(generate_series(0,
          CAST(ntok - $SpanLen AS BIGINT), $SpanStep)) s(j)
        WHERE ntok >= $SpanLen),
      cover AS (
        SELECT s.doc_id, s.j, COUNT(*) AS n_cover
        FROM spans s JOIN chunks c ON c.doc_id = s.doc_id
          AND c.tok_start <= s.j
          AND s.j + $SpanLen <= c.tok_start + c.n_tok
        GROUP BY 1, 2)
      SELECT doc_id, COUNT(*) AS n_spans,
             MIN(n_cover) AS min_cover, MAX(n_cover) AS max_cover
      FROM cover GROUP BY 1 ORDER BY doc_id"""))

  val all: Seq[Qry] = Seq(q192)
}
