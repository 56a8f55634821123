package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.Multimodal
import Q._

/** Multimodal-plumbing queries: documents.text cast to binary stands
  * in for media payloads (deterministic, driver-sanctioned input).
  * The decode itself is the documented stub; what these verify is
  * the PLUMBING — binary schema flow, per-partition batch decode,
  * payload-pruned metadata paths.
  */
object MultimodalQ {

  /** Metadata-only envelope stats (payload never decoded — column
    * pruning drops it from any scan that selects only these). */
  val q41 = Qry(
    "q41_media_meta",
    (s: SparkSession, d: String) =>
      Multimodal.payloadMeta(
          Tables.documents(s, d)
            .filter(col("doc_id") < 300)
            .withColumn("payload", col("text").cast("binary")),
          "payload")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          min(col("payload_md5")).as("min_md5"))
        .orderBy(col("lang")),
    Some("""
      SELECT lang, COUNT(*) AS n,
             CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
             MIN(md5(text)) AS min_md5
      FROM documents WHERE doc_id < 300
      GROUP BY lang ORDER BY lang"""))

  /** Per-partition batched decode through the typed Dataset path:
    * the stub features are byte arithmetic, so DuckDB re-derives
    * them from the text (ASCII corpus → bytes == codepoints). */
  val q42 = Qry(
    "q42_media_decode",
    (s: SparkSession, d: String) => {
      val session = s
      import session.implicits._
      val media = Multimodal.asMedia(
        Tables.documents(s, d)
          .filter(col("doc_id") < 200)
          .withColumn("payload", col("text").cast("binary"))
          .withColumn("kind",
            element_at(typedLit(Seq("image", "audio", "video")),
              (col("doc_id") % 3 + 1).cast("int"))),
        "doc_id", "payload", "kind", "source")
      Multimodal.decodeFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("first_byte"), col("last_byte"),
          col("fake_width"), col("fake_height"))
        .orderBy(col("media_id"))
    },
    Some("""
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
               ELSE 'video' END AS kind,
             CAST(length(text) AS BIGINT) AS n_bytes,
             unicode(left(text, 1)) AS first_byte,
             unicode(right(text, 1)) AS last_byte,
             (unicode(left(text, 1)) * 7) % 640 + 1 AS fake_width,
             (unicode(right(text, 1)) * 5) % 480 + 1 AS fake_height
      FROM documents WHERE doc_id < 200
      ORDER BY media_id"""))

  val all: Seq[Qry] = Seq(q41, q42)
}
