package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.Corpus

/** Retrieval-prep surface: q192 overlapping token-window chunking
  * ([[Corpus.chunkTokens]]) — the document→retrieval-unit splitter a
  * RAG/embedding pipeline runs before the embed+index stages (q31-q33
  * and the PQ/SQ8 family consume its output shape). The oracle
  * replays tokenization, the ceil-division chunk count, window
  * arithmetic, and the text re-join.
  */
object RagQ {

  private val Size = 64
  private val Overlap = 16
  private val Stride = Size - Overlap

  val q192 = Qry(
    "q192_chunk_overlap",
    (s: SparkSession, d: String) =>
      Corpus.chunkTokens(Tables.documents(s, d), "doc_id", "text",
          Size, Overlap)
        .orderBy(col("doc_id"), col("chunk_idx")),
    Some(s"""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                 x -> x <> '') AS tk
        FROM documents),
      n AS (
        SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS ntok
        FROM toks WHERE len(tk) > 0),
      c AS (
        SELECT doc_id, tk, ntok, CAST(i AS BIGINT) AS chunk_idx,
               CAST(i AS BIGINT) * $Stride AS tok_start
        FROM n, unnest(generate_series(0,
          CAST((greatest(ntok - $Size, 0) + ${Stride - 1}) // $Stride
            AS BIGINT))) s(i))
      SELECT doc_id, chunk_idx, tok_start,
             least($Size, ntok - tok_start) AS n_tok,
             array_to_string(list_slice(tk,
               CAST(tok_start + 1 AS INT),
               CAST(tok_start + least($Size, ntok - tok_start) AS INT)),
               ' ') AS chunk_text
      FROM c ORDER BY doc_id, chunk_idx"""))

  val all: Seq[Qry] = Seq(q192)
}
