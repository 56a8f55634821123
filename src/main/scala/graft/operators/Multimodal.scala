package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (builder brief: image/audio/video as opaque
  * binary + typed metadata), with REAL format handling — no stubs:
  *
  *  - [[probe]]: pure-JVM header parsing of PNG (signature + IHDR:
  *    width/height/bit depth/color type) and WAV/RIFF (fmt + data
  *    chunk walk: channels/sample rate/bits/duration) — the cheap
  *    path that never decodes pixels/samples.
  *  - [[decodeImages]]: full image decode through `javax.imageio`
  *    (the JDK's real PNG/GIF/BMP/JPEG codec) emitting pixel-level
  *    features. Runs in `mapPartitions` — codec context per
  *    partition, iterator-streamed, no shuffle.
  *  - [[synthPng]]/[[synthWav]]: minimal-but-valid container
  *    encoders (real CRCs, real chunk layout) for generating test
  *    corpora and encode→probe differential checks.
  *
  * Scale shape: probing is map-side byte inspection (~50 bytes
  * touched per record); metadata-only paths stay pure-column so
  * Parquet scans prune the payload entirely.
  */
object Multimodal {

  /** A media row: opaque payload + typed envelope metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Parsed container-header features; fields are null where the
    * format doesn't define them (image vs audio). */
  final case class MediaProbe(
      media_id: Long,
      n_bytes: Long,
      format: String,        // png | wav | unknown
      width: Option[Int],
      height: Option[Int],
      bit_depth: Option[Int],
      color_type: Option[Int],
      channels: Option[Int],
      sample_rate: Option[Int],
      bits_per_sample: Option[Int],
      duration_ms: Option[Long])

  /** Pixel-level features from a full ImageIO decode. */
  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      n_pixels: Long,
      mean_luma: Double)

  /** Wrap any table with a binary column into media records. */
  def asMedia(df: DataFrame, idCol: String, binCol: String,
      kindCol: String, sourceCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("media_id"), col(kindCol).as("kind"),
        col(binCol).as("payload"), col(sourceCol).as("source"))
      .as[MediaRecord]
  }

  // ---- header parsers (pure JVM, allocation-free inspection) ------

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** PNG header: 8-byte signature, then the IHDR chunk (must be
    * first per the PNG spec): length=13, "IHDR", width/height as
    * big-endian u32, bit depth, color type. */
  def probePng(b: Array[Byte]): Option[(Int, Int, Int, Int)] =
    if (b.length >= 33 && b.take(8).sameElements(PngSig) &&
        be32(b, 8) == 13 && tag(b, 12) == "IHDR")
      Some((be32(b, 16), be32(b, 20), b(24) & 0xff, b(25) & 0xff))
    else None

  /** WAV/RIFF: "RIFF" size "WAVE", then a chunk walk for "fmt "
    * (channels, sample rate, bits/sample) and "data" (payload size →
    * duration = dataBytes / byteRate). probe() sees arbitrary
    * payloads, so the walk must be hostile-input-safe: chunk sizes
    * are RIFF u32 — read UNSIGNED into a Long offset (a signed read
    * of 0xFFFFFFF8 is -8, turning the stride into a zero/negative
    * increment = infinite loop or backwards walk), and bail unless
    * the offset strictly advances. */
  def probeWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    var i = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var dataBytes = -1L
    var ok = true
    while (ok && i + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
      val p = i.toInt
      val id = tag(b, p)
      val size = le32(b, p + 4) & 0xFFFFFFFFL
      if (id == "fmt " && p + 24 <= b.length)
        fmt = Some((le16(b, p + 10), le32(b, p + 12), le16(b, p + 22)))
      else if (id == "data")
        dataBytes = size
      // chunks are word-aligned: odd sizes carry a pad byte
      val next = i + 8L + size + (size & 1L)
      if (next <= i) ok = false else i = next
    }
    fmt.collect { case (ch, rate, bits) if dataBytes >= 0 &&
        ch > 0 && rate > 0 && bits > 0 =>
      val byteRate = rate.toLong * ch * bits / 8
      (ch, rate, bits, dataBytes * 1000L / byteRate)
    }
  }

  /** Batched per-partition header probe — the production decode-path
    * shape (iterator-streamed, init amortized per partition). */
  def probe(media: Dataset[MediaRecord]): Dataset[MediaProbe] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        probePng(b) match {
          case Some((w, h, depth, color)) =>
            MediaProbe(r.media_id, b.length.toLong, "png",
              Some(w), Some(h), Some(depth), Some(color),
              None, None, None, None)
          case None => probeWav(b) match {
            case Some((ch, rate, bits, durMs)) =>
              MediaProbe(r.media_id, b.length.toLong, "wav",
                None, None, None, None,
                Some(ch), Some(rate), Some(bits), Some(durMs))
            case None =>
              MediaProbe(r.media_id, b.length.toLong, "unknown",
                None, None, None, None, None, None, None, None)
          }
        }
      }
    }
  }

  /** FULL image decode via the JDK's real ImageIO codec (PNG, GIF,
    * BMP, JPEG): pixel dimensions plus mean luminance over all
    * pixels. Undecodable payloads are dropped (flatMap), mirroring
    * the reference's skip-bad-rows posture. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one codec scratch context per partition; ImageIO caches
      // reader instances per thread internally
      rows.flatMap { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            Some(ImageFeatures(r.media_id, w, h, w.toLong * h,
              sum / (w.toLong * h)))
          }
          // NonFatal only: a decompression-bomb OOM or a task-kill
        // interrupt must fail the task, not vanish as "undecodable"
      } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  // ---- container encoders (for corpora + encode→probe checks) -----

  private def pngChunk(typ: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = out.write(Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
    w32(body.length)
    val typed = typ.getBytes("US-ASCII") ++ body
    out.write(typed)
    val crc = new java.util.zip.CRC32()
    crc.update(typed)
    w32(crc.getValue.toInt)
    out.toByteArray
  }

  /** Minimal VALID PNG (signature, IHDR with real CRC, IEND): enough
    * for any header-level reader; no pixel data chunks. */
  def synthPng(width: Int, height: Int, bitDepth: Int = 8,
      colorType: Int = 2): Array[Byte] = {
    val ihdr = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = ihdr.write(Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
    w32(width); w32(height)
    ihdr.write(bitDepth); ihdr.write(colorType)
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate/none/none
    PngSig ++ pngChunk("IHDR", ihdr.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Valid 44-byte-header PCM WAV with `nSamples` zero samples. */
  def synthWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    def asc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Int): Unit = out.write(Array(
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte))
    def w16(v: Int): Unit = out.write(Array(v.toByte, (v >>> 8).toByte))
    asc("RIFF"); w32(36 + dataSize); asc("WAVE")
    asc("fmt "); w32(16); w16(1); w16(channels); w32(sampleRate)
    w32(sampleRate * blockAlign); w16(blockAlign); w16(bitsPerSample)
    asc("data"); w32(dataSize)
    out.write(new Array[Byte](dataSize))
    out.toByteArray
  }

  /** Metadata-only path (no decode): pure column expressions so the
    * optimizer can prune the payload from the scan when only
    * envelope stats are needed. */
  def payloadMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("payload_md5", md5(col(binCol)))
}
