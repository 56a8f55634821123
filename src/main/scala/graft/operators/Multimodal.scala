package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief: image/audio/video as
  * opaque binary + typed metadata). The Spark-side machinery —
  * schema, batched per-partition decode, partitioning — is real and
  * tested; the actual media codec is STUBBED with a deterministic
  * fake (this container has no image/audio libraries), clearly
  * marked below. Swap `fakeDecode` for a real codec (e.g. javacv)
  * without touching any plumbing.
  *
  * Scale shape: decode runs inside `mapPartitions` — one codec
  * context per partition, streaming the iterator (never
  * materializing a partition in memory), no shuffle. Metadata-only
  * paths stay pure-column (codegen'd) so pruning pushes the binary
  * column out of scans that don't decode.
  */
object Multimodal {

  /** A media row: opaque payload + typed envelope metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Decoded features produced per record by the (stubbed) codec. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      first_byte: Int,
      last_byte: Int,
      // a real decoder would emit width/height/duration here; the
      // stub derives deterministic stand-ins from the payload
      fake_width: Int,
      fake_height: Int)

  /** Wrap any table with a binary column into media records. */
  def asMedia(df: DataFrame, idCol: String, binCol: String,
      kindCol: String, sourceCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("media_id"), col(kindCol).as("kind"),
        col(binCol).as("payload"), col(sourceCol).as("source"))
      .as[MediaRecord]
  }

  /** STUB — deterministic fake decoder standing in for a real
    * image/audio codec (none available in this environment). Keeps
    * the exact signature a real batch decoder needs: bytes in,
    * features out, no Spark types. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int) = {
    val first = if (payload.nonEmpty) payload(0) & 0xff else 0
    val last = if (payload.nonEmpty) payload(payload.length - 1) & 0xff
      else 0
    // fake "dimensions" from header bytes, as a codec would parse
    ((first * 7) % 640 + 1, (last * 5) % 480 + 1)
  }

  /** Batched per-partition decode: the production pattern for codec
    * work (amortized codec init per partition, iterator-streamed). */
  def decodeFeatures(media: Dataset[MediaRecord])
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs would init a context here, once per partition
      rows.map { r =>
        val (w, h) = fakeDecode(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          if (r.payload.nonEmpty) r.payload(0) & 0xff else 0,
          if (r.payload.nonEmpty) r.payload(r.payload.length - 1) & 0xff
          else 0, w, h)
      }
    }
  }

  /** Metadata-only path (no decode): pure column expressions so the
    * optimizer can prune the payload from the scan when only
    * envelope stats are needed. */
  def payloadMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("payload_md5", md5(col(binCol)))
}
