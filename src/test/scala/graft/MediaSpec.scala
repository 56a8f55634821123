package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** Real-codec multimodal tests: the header probe against PNGs/WAVs
  * produced by INDEPENDENT encoders (the JDK's ImageIO and
  * AudioSystem, not our own synth), plus full pixel decode with
  * known ground truth.
  */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  /** A genuine PNG from the JDK encoder, solid-filled. */
  private def realPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A genuine WAV from the JDK sound stack. */
  private def realWav(rate: Float, channels: Int, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def probeOne(payload: Array[Byte]) =
    Multimodal.probe(Seq(MediaRecord(1L, "x", payload, "t")).toDS())
      .collect().head

  test("probe parses a JDK-encoded real PNG's dimensions") {
    val p = probeOne(realPng(17, 9, 0xff0000))
    assert(p.format == "png")
    assert(p.width.contains(17) && p.height.contains(9))
    assert(p.bit_depth.contains(8))
    assert(p.channels.isEmpty && p.sample_rate.isEmpty)
  }

  test("probe parses a JDK-encoded real WAV's format and duration") {
    // 8000 frames at 16 kHz stereo = exactly 500 ms
    val p = probeOne(realWav(16000f, 2, 8000))
    assert(p.format == "wav")
    assert(p.channels.contains(2))
    assert(p.sample_rate.contains(16000))
    assert(p.bits_per_sample.contains(16))
    assert(p.duration_ms.contains(500L))
    assert(p.width.isEmpty)
  }

  test("probe round-trips our own synth containers") {
    val png = probeOne(Multimodal.synthPng(640, 360, 8, 2))
    assert(png.format == "png" && png.width.contains(640) &&
      png.height.contains(360) && png.color_type.contains(2))
    val wav = probeOne(Multimodal.synthWav(44100, 1, 16, 44100))
    assert(wav.format == "wav" && wav.sample_rate.contains(44100) &&
      wav.duration_ms.contains(1000L))
  }

  test("probe marks non-media bytes unknown") {
    val p = probeOne("just some text".getBytes("UTF-8"))
    assert(p.format == "unknown")
    assert(p.width.isEmpty && p.sample_rate.isEmpty)
    assert(p.n_bytes == 14L)
  }

  /** Hand-build a RIFF/WAVE container with an arbitrary chunk list:
    * each chunk is (tag, declaredSize, actualBodyBytes). */
  private def riff(chunks: (String, Long, Int)*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def asc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit = out.write(Array(
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte))
    asc("RIFF"); w32(1000L); asc("WAVE")
    chunks.foreach { case (tag, declared, actual) =>
      asc(tag); w32(declared); out.write(new Array[Byte](actual))
    }
    // pad to the 44-byte minimum the probe gate requires
    while (out.size() < 44) out.write(0)
    out.toByteArray
  }

  test("probeWav rejects a fmt chunk whose declared byte rate truncates to 0") {
    // ch=1, rate=1, bits=1: rate*ch*bits/8 = 0 in integer math — an
    // unguarded duration division would throw ArithmeticException on
    // this single payload (and kill a whole streaming micro-batch)
    val out = new ByteArrayOutputStream()
    def asc(s: String) = out.write(s.getBytes("US-ASCII"))
    def w16(v: Int) = out.write(Array(v.toByte, (v >>> 8).toByte))
    def w32(v: Int) = out.write(Array(v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte))
    asc("RIFF"); w32(36); asc("WAVE")
    asc("fmt "); w32(16)
    w16(1); w16(1); w32(1); w32(0); w16(1); w16(1) // tag=1 ch=1 rate=1 bits=1
    asc("data"); w32(8); out.write(new Array[Byte](8))
    val b = out.toByteArray
    assert(Multimodal.probeWav(b).isEmpty) // guarded, not thrown
    // and the full probe path (what streaming ingest calls) survives too
    assert(probeOne(b).format == "unknown")
  }

  test("probeWav survives a hostile chunk size that reads as -8 signed") {
    // 0xFFFFFFF8 signed is -8: a signed walk would stride by ZERO
    // (8 + size + pad = 0) and loop forever on this payload
    val b = riff(("junk", 0xFFFFFFF8L, 8))
    assert(Multimodal.probeWav(b).isEmpty) // terminates, no data chunk
  }

  test("probeWav survives negative-stride chunk sizes without walking backwards") {
    // 0xFFFFFFE0 signed is -32: offset would move BACKWARDS forever
    val b = riff(("junk", 0xFFFFFFE0L, 16), ("fmt ", 16L, 16))
    assert(Multimodal.probeWav(b).isEmpty) // unsigned read: walks off the end
  }

  test("probeWav still parses valid chunks before a hostile one") {
    // fmt and data first, then a huge-size trailer: both fields are
    // found before the walk hits the oversized chunk and exits
    val fmtBody = {
      val o = new ByteArrayOutputStream()
      def w16(v: Int) = o.write(Array(v.toByte, (v >>> 8).toByte))
      def w32(v: Int) = o.write(Array(v.toByte, (v >>> 8).toByte,
        (v >>> 16).toByte, (v >>> 24).toByte))
      w16(1); w16(1); w32(8000); w32(16000); w16(2); w16(16)
      o.toByteArray
    }
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(Array[Byte](0, 4, 0, 0))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(Array[Byte](16, 0, 0, 0)); out.write(fmtBody)
    out.write("data".getBytes("US-ASCII"))
    out.write(Array[Byte](16, 0, 0, 0)); out.write(new Array[Byte](16))
    out.write("junk".getBytes("US-ASCII"))
    out.write(Array[Byte](-1, -1, -1, -1)) // size 0xFFFFFFFF
    val p = Multimodal.probeWav(out.toByteArray)
    assert(p.contains((1, 8000, 16, 1L))) // 16 bytes / 16000 B/s = 1 ms
  }

  /** Hand-build ISO-BMFF boxes big-endian for hostile-input cases. */
  private def bmffBox(typ: String, body: Array[Byte],
      declared: Option[Long] = None): Array[Byte] = {
    val size = declared.getOrElse(8L + body.length)
    Array((size >>> 24).toByte, (size >>> 16).toByte,
      (size >>> 8).toByte, size.toByte) ++
      typ.getBytes("US-ASCII") ++ body
  }

  test("probe round-trips our own synth MP4 (brand, duration, tracks)") {
    val p = probeOne(Multimodal.synthMp4("isom", 1000, 2500L, 2))
    assert(p.format == "mp4")
    assert(p.brand.contains("isom"))
    assert(p.duration_ms.contains(2500L))
    assert(p.n_tracks.contains(2))
    assert(p.n_bytes == 136L + 100L * 2)
    assert(p.width.isEmpty && p.sample_rate.isEmpty)
  }

  test("probeMp4 floors a non-ms timescale exactly") {
    // 7 units at timescale 3: 7*1000/3 = 2333 ms, floored
    val p = probeOne(Multimodal.synthMp4("mp42", 3, 7L, 1))
    assert(p.duration_ms.contains(2333L))
  }

  test("probeMp4 reads a v1 (64-bit) mvhd and a largesize box") {
    def u32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    // mvhd v1: ver=1/flags, creation u64, modification u64,
    // timescale u32, duration u64
    val mvhd1 = bmffBox("mvhd",
      u32(0x01000000L) ++ new Array[Byte](16) ++ u32(600L) ++
        u32(0L) ++ u32(1500L))
    // moov declared with size==1 → u64 largesize follows the type
    val inner = mvhd1 ++ bmffBox("trak", new Array[Byte](0))
    val largesize = 16L + inner.length
    val moov = u32(1L) ++ "moov".getBytes("US-ASCII") ++
      u32(0L) ++ u32(largesize) ++ inner
    val ftyp = bmffBox("ftyp",
      "avc1".getBytes("US-ASCII") ++ u32(0L))
    val got = Multimodal.probeMp4(ftyp ++ moov)
    assert(got.contains(("avc1", 2500L, 1))) // 1500/600 s = 2500 ms
  }

  test("probeMp4 bails on a hostile sub-header box size instead of looping") {
    // declared size 4 < the 8-byte header: a naive walk strides by
    // size-8 = -4 and never terminates
    val bad = bmffBox("free", new Array[Byte](16), declared = Some(4L))
    val ftyp = bmffBox("ftyp", "isom".getBytes("US-ASCII") ++
      new Array[Byte](4))
    assert(Multimodal.probeMp4(ftyp ++ bad).isEmpty) // no moov reached
  }

  test("probeMp4 keeps fields parsed before a truncated trailing box") {
    val whole = Multimodal.synthMp4("isom", 1000, 999L, 1) ++
      bmffBox("mdat", new Array[Byte](0), declared = Some(0x7FFFFFFFL))
    val got = Multimodal.probeMp4(whole)
    assert(got.contains(("isom", 999L, 1)))
  }

  test("probeMp4 rejects non-BMFF payloads and ftyp-less walks") {
    assert(Multimodal.probeMp4("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.probeMp4(Multimodal.synthPng(4, 4)).isEmpty)
    // ftyp alone (no moov) is not probeable video
    val ftypOnly = bmffBox("ftyp", "isom".getBytes("US-ASCII") ++
      new Array[Byte](4))
    assert(Multimodal.probeMp4(ftypOnly).isEmpty)
  }

  test("decodeImages fully decodes pixels via ImageIO with exact luma") {
    // solid gray 100: luma = 0.299*100 + 0.587*100 + 0.114*100 = 100
    val media = Seq(
      MediaRecord(1L, "image", realPng(10, 4, 0x646464), "t"),
      MediaRecord(2L, "image", "garbage".getBytes("UTF-8"), "t"))
      .toDS()
    val feats = Multimodal.decodeImages(media).collect()
    assert(feats.length == 1) // undecodable row dropped
    val f = feats.head
    assert(f.media_id == 1L && f.width == 10 && f.height == 4 &&
      f.n_pixels == 40L)
    assert(math.abs(f.mean_luma - 100.0) < 1e-9)
  }

  test("JDK PNG encoder output is parsed identically by probe and full decode") {
    val bytes = realPng(33, 21, 0x123456)
    val viaProbe = probeOne(bytes)
    val viaDecode = Multimodal.decodeImages(
      Seq(MediaRecord(1L, "image", bytes, "t")).toDS()).collect().head
    assert(viaProbe.width.contains(viaDecode.width))
    assert(viaProbe.height.contains(viaDecode.height))
  }

  /** A genuine JPEG from the JDK encoder, solid-filled. */
  private def realJpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("probeJpeg parses a JDK-encoded REAL JPEG's frame header") {
    // the JDK writer emits JFIF APP0 + quant/huffman tables before
    // SOF0 — the marker walk must skip them all correctly
    val p = probeOne(realJpeg(29, 13, 0x4080c0))
    assert(p.format == "jpeg", p.format)
    assert(p.width.contains(29) && p.height.contains(13))
    assert(p.bit_depth.contains(8))
    assert(p.n_components.contains(3))
    // and the full ImageIO decode agrees with the header walk
    val viaDecode = Multimodal.decodeImages(
      Seq(MediaRecord(1L, "image", realJpeg(29, 13, 0x4080c0), "t"))
        .toDS()).collect().head
    assert(p.width.contains(viaDecode.width) &&
      p.height.contains(viaDecode.height))
  }

  test("probeJpeg round-trips synthJpeg; layout size is exact") {
    for ((w, h, nc) <- Seq((1, 1, 1), (1024, 768, 3), (65535, 65535, 4))) {
      val b = Multimodal.synthJpeg(w, h, precision = 8, nComponents = nc)
      assert(b.length == 32 + 3 * nc)
      assert(Multimodal.probeJpeg(b).contains((w, h, 8, nc)),
        s"($w,$h,$nc)")
    }
  }

  test("probeJpeg hostile inputs: truncation, SOS-before-SOF, fill bytes") {
    val good = Multimodal.synthJpeg(100, 50)
    // any truncation before the SOF body must fail cleanly, not throw
    (0 until 30).foreach { n =>
      assert(Multimodal.probeJpeg(good.take(n)).isEmpty, s"take($n)")
    }
    // a scan marker before any frame header bails
    val sosFirst = Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0x00, 0x00)
      .map(_.toByte)
    assert(Multimodal.probeJpeg(sosFirst).isEmpty)
    // FF fill bytes before a marker are skipped per spec
    val padded = good.take(2) ++ Array(0xFF.toByte) ++ good.drop(2)
    assert(Multimodal.probeJpeg(padded).contains((100, 50, 8, 3)))
    // a segment length lying past EOF bails
    val lying = good.clone()
    lying(4) = 0x7F.toByte // APP0 len hi byte -> huge
    assert(Multimodal.probeJpeg(lying).isEmpty)
    // non-JPEG bytes
    assert(Multimodal.probeJpeg("not a jpeg".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.probeJpeg(Multimodal.synthPng(4, 4)).isEmpty)
  }

  test("synthPngGray round-trips exact pixel values through ImageIO") {
    def luma(x: Int, y: Int): Int = (x * 31 + y * 57) % 256
    val b = Multimodal.synthPngGray(13, 7, luma)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b))
    assert(img.getWidth == 13 && img.getHeight == 7)
    val raster = img.getRaster
    for (y <- 0 until 7; x <- 0 until 13)
      assert(raster.getSample(x, y, 0) == luma(x, y), s"($x,$y)")
  }

  test("dHash pairs planted near-identical images, separates distinct ones") {
    def luma(x: Int, y: Int): Int = (x * 151 + y * 211 + x * y * 31) % 256
    val base = Multimodal.synthPngGray(36, 32, luma)
    // near-dup: +2 on a sparse diagonal — most row gradients survive
    val near = Multimodal.synthPngGray(36, 32,
      (x, y) => (luma(x, y) + (if ((x + y) % 9 == 0) 2 else 0)) % 256)
    // unrelated pattern
    val far = Multimodal.synthPngGray(36, 32,
      (x, y) => ((x * 7 ^ y * 13) * 41) % 256)
    val media = Seq(
      MediaRecord(1L, "image", base, "t"),
      MediaRecord(2L, "image", near, "t"),
      MediaRecord(3L, "image", far, "t")).toDS()
    val hashes = Multimodal.dHash(media).toDF()
    val pairs = Multimodal
      .dhashNearDupPairs(hashes, "media_id", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    assert(pairs.exists { case (a, b, hm) => a == 1L && b == 2L && hm <= 6 },
      s"planted near-dup not found: $pairs")
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L },
      s"unrelated image paired: $pairs")
  }

  test("band join guarantees any pair within Hamming 3 is a candidate") {
    // pigeonhole: 4 exact-match bands over 64 bits — at most 3 flipped
    // bits touch at most 3 bands, so one band always survives intact.
    // 40 deterministic cases: random base hash, 1-3 random bit flips.
    val rnd = new scala.util.Random(42)
    val cases = (0 until 40).map { c =>
      val hi = rnd.nextLong() & 0xFFFFFFFFL
      val lo = rnd.nextLong() & 0xFFFFFFFFL
      val bits = Seq.fill(c % 3 + 1)(rnd.nextInt(64)).distinct
      var hi2 = hi
      var lo2 = lo
      bits.foreach { b =>
        if (b < 32) hi2 ^= 1L << b else lo2 ^= 1L << (b - 32)
      }
      (c.toLong, hi, lo, hi2, lo2)
    }
    val hashes = cases.flatMap { case (c, hi, lo, hi2, lo2) =>
      Seq((c * 2, hi, lo), (c * 2 + 1, hi2, lo2))
    }.toDF("media_id", "h_hi", "h_lo")
    val pairs = Multimodal.dhashNearDupPairs(hashes, "media_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    cases.foreach { case (c, _, _, _, _) =>
      assert(pairs.contains((c * 2, c * 2 + 1)), s"case $c missed")
    }
  }

  test("audioFingerprint decodes real PCM and matches hand-folded energies") {
    // 65 frames of 256 samples; frame f is a constant +/- (f+1) square
    // wave -> E_f = 256*(f+1), strictly increasing -> every gradient
    // bit set -> h_hi = h_lo = 2^32 - 1
    val samples = Array.tabulate(65 * 256) { i =>
      val f = i / 256
      if (i % 2 == 0) f + 1 else -(f + 1)
    }
    val media = Seq(MediaRecord(1L, "audio",
      Multimodal.synthWavPcm(8000, samples), "t")).toDS()
    val h = Multimodal.audioFingerprint(media).collect().head
    assert(h.n_samples == 65L * 256)
    assert(h.h_hi == 0xFFFFFFFFL && h.h_lo == 0xFFFFFFFFL)
  }

  test("audioFingerprint pairs a planted near-identical clip, separates noise") {
    def clip(amp: Int => Int): Array[Byte] = {
      val samples = Array.tabulate(65 * 256) { i =>
        amp(i / 256) * (if (i % 2 == 0) 1 else -1)
      }
      Multimodal.synthWavPcm(8000, samples)
    }
    def baseAmp(f: Int): Int = (f * 7 % 13) + 1
    val base = clip(baseAmp)
    // near: ONE frame's amplitude edited (11 -> 4, a localized dropout
    // in a 65-frame clip) — flips exactly the two gradient bits
    // touching frame 20: E19=E20 ties to 0 (was 1), E20<E21 turns 1
    // (was 0); every other comparison is untouched
    val near = clip(f => if (f == 20) 4 else baseAmp(f))
    // unrelated gradient structure
    val far = clip(f => (f * 11 % 29) + 1)
    val media = Seq(
      MediaRecord(1L, "audio", base, "t"),
      MediaRecord(2L, "audio", near, "t"),
      MediaRecord(3L, "audio", far, "t")).toDS()
    val hashes = Multimodal.audioFingerprint(media).toDF()
    val pairs = Multimodal
      .dhashNearDupPairs(hashes, "media_id", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    assert(pairs.exists { case (a, b, hm) =>
      a == 1L && b == 2L && hm >= 1 && hm <= 2 },
      s"planted near-dup not found at small nonzero Hamming: $pairs")
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L },
      s"unrelated clip paired: $pairs")
  }

  test("audioFingerprint drops non-mono/non-16-bit/short/garbage payloads") {
    val good = Multimodal.synthWavPcm(8000,
      Array.tabulate(65 * 256)(i => i % 100))
    val shortClip = Multimodal.synthWavPcm(8000, Array.fill(1000)(5))
    val stereo = Multimodal.synthWav(8000, 2, 16, 65 * 256)
    val eightBit = Multimodal.synthWav(8000, 1, 8, 65 * 256)
    // format tag 0xFFFE (EXTENSIBLE) declaring mono/16-bit: the bytes
    // are NOT raw PCM samples and must not be fingerprinted as such
    val nonPcm = good.clone()
    nonPcm(20) = 0xFE.toByte; nonPcm(21) = 0xFF.toByte
    val media = Seq(
      MediaRecord(1L, "audio", good, "t"),
      MediaRecord(2L, "audio", shortClip, "t"),
      MediaRecord(3L, "audio", stereo, "t"),
      MediaRecord(4L, "audio", eightBit, "t"),
      MediaRecord(5L, "audio", "not a wav".getBytes("UTF-8"), "t"),
      MediaRecord(6L, "audio", nonPcm, "t")).toDS()
    assert(Multimodal.audioFingerprint(media).collect()
      .map(_.media_id).toList == List(1L))
  }

  test("audioFingerprint survives hostile chunk sizes (no loop, no throw)") {
    val good = Multimodal.synthWavPcm(8000,
      Array.tabulate(65 * 256)(i => i % 50))
    // chunk size 0xFFFFFFF8 reads as -8 signed: a naive walk strides
    // backwards forever; the unsigned walk must bail
    val hostile = good.clone()
    hostile(16) = 0xF8.toByte; hostile(17) = 0xFF.toByte
    hostile(18) = 0xFF.toByte; hostile(19) = 0xFF.toByte
    // data size lying past EOF must not be read
    val lying = good.clone()
    lying(40) = 0x7F.toByte; lying(41) = 0x7F.toByte
    lying(42) = 0x7F.toByte; lying(43) = 0x7F.toByte
    val media = Seq(
      MediaRecord(1L, "audio", hostile, "t"),
      MediaRecord(2L, "audio", lying, "t"),
      MediaRecord(3L, "audio", good.take(30), "t"),
      MediaRecord(4L, "audio", good, "t")).toDS()
    assert(Multimodal.audioFingerprint(media).collect()
      .map(_.media_id).toList == List(4L))
  }

  test("videoFingerprint: known-answer hash on strictly increasing frame energy") {
    // 65 frames of 256 bytes; frame f is a constant fill of value f
    // -> E_f = 256*f, strictly increasing -> every gradient bit set
    val mdat = Array.tabulate(65 * 256)(i => (i / 256).toByte)
    val media = Seq(MediaRecord(1L, "video",
      Multimodal.synthMp4("isom", 1000, 65000L, 1, mdat), "t")).toDS()
    val h = Multimodal.videoFingerprint(media).collect().head
    assert(h.n_frames == 65L)
    assert(h.h_hi == 0xFFFFFFFFL && h.h_lo == 0xFFFFFFFFL)
  }

  test("videoFingerprint pairs a planted re-encoded variant, separates noise") {
    def clip(amp: Int => Int): Array[Byte] = {
      val mdat = Array.tabulate(65 * 256)(i => amp(i / 256).toByte)
      Multimodal.synthMp4("isom", 1000, 65000L, 1, mdat)
    }
    def baseAmp(f: Int): Int = (f * 7 % 13) + 1
    val base = clip(baseAmp)
    // ONE frame's fill edited (a localized glitch): flips exactly the
    // two gradient bits touching frame 20, everything else untouched
    val near = clip(f => if (f == 20) 4 else baseAmp(f))
    val far = clip(f => (f * 11 % 29) + 1)
    val media = Seq(
      MediaRecord(1L, "video", base, "t"),
      MediaRecord(2L, "video", near, "t"),
      MediaRecord(3L, "video", far, "t")).toDS()
    val hashes = Multimodal.videoFingerprint(media).toDF()
    val pairs = Multimodal
      .dhashNearDupPairs(hashes, "media_id", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    assert(pairs.exists { case (a, b, hm) =>
      a == 1L && b == 2L && hm >= 1 && hm <= 2 },
      s"planted near-dup not found at small nonzero Hamming: $pairs")
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L },
      s"unrelated clip paired: $pairs")
  }

  test("video/audio fingerprints are invariant under a global amplitude rescale") {
    // the re-encode invariance claim made precise: scaling every
    // frame's magnitude by a constant preserves every energy
    // GRADIENT sign, so the 64-bit hash is identical — exactly what
    // survives a transcode that rescales levels uniformly
    def vclip(scale: Int): Array[Byte] = {
      val mdat = Array.tabulate(65 * 256) { i =>
        (((i / 256) % 13 + 1) * scale * (i % 256 % 4)).toByte
      }
      Multimodal.synthMp4("isom", 1000, 65000L, 1, mdat)
    }
    val vm = Seq(
      MediaRecord(1L, "video", vclip(1), "t"),
      MediaRecord(2L, "video", vclip(2), "t")).toDS()
    val vh = Multimodal.videoFingerprint(vm).collect()
      .map(h => (h.h_hi, h.h_lo)).distinct
    assert(vh.length == 1, s"video hash changed under 2x rescale: $vh")

    def aclip(scale: Int): Array[Byte] = Multimodal.synthWavPcm(8000,
      Array.tabulate(65 * 256) { i =>
        ((i / 256) % 13 + 1) * scale * (if (i % 2 == 0) 1 else -1)
      })
    val am = Seq(
      MediaRecord(1L, "audio", aclip(1), "t"),
      MediaRecord(2L, "audio", aclip(3), "t")).toDS()
    val ah = Multimodal.audioFingerprint(am).collect()
      .map(h => (h.h_hi, h.h_lo)).distinct
    assert(ah.length == 1, s"audio hash changed under 3x rescale: $ah")
  }

  test("videoFingerprint drops mdat-less/short/garbage payloads, survives hostile sizes") {
    val good = Multimodal.synthMp4("isom", 1000, 65000L, 1,
      Array.tabulate(65 * 256)(i => (i % 100).toByte))
    val noMdat = Multimodal.synthMp4("isom", 1000, 65000L, 1)
    val shortClip = Multimodal.synthMp4("isom", 1000, 1000L, 1,
      new Array[Byte](256)) // one frame — under the 65-frame floor
    // hostile: mdat box size field lies far past EOF — the walk must
    // refuse the box (next > until), not read out of bounds
    val lying = good.clone()
    val mdatOff = good.length - (8 + 65 * 256)
    lying(mdatOff) = 0x7F.toByte; lying(mdatOff + 1) = 0x7F.toByte
    lying(mdatOff + 2) = 0x7F.toByte; lying(mdatOff + 3) = 0x7F.toByte
    val media = Seq(
      MediaRecord(1L, "video", good, "t"),
      MediaRecord(2L, "video", noMdat, "t"),
      MediaRecord(3L, "video", shortClip, "t"),
      MediaRecord(4L, "video", "not an mp4".getBytes("UTF-8"), "t"),
      MediaRecord(5L, "video", lying, "t")).toDS()
    assert(Multimodal.videoFingerprint(media).collect()
      .map(_.media_id).toList == List(1L))
  }

  test("trimmed clip: invisible to the fixed-position fingerprint, " +
      "found by the sign-shingle path") {
    // base: 80 frames of varying fill; trimmed: the same content
    // starting 5 frames later (head-trim + fresh tail) — a cut of
    // the same footage
    def clip(off: Int): Array[Byte] = {
      val mdat = Array.tabulate(80 * 256) { i =>
        val cf = i / 256 + off
        (((cf * cf * 7 + cf * 3) % 13 + 1) * (i % 256 % 4)).toByte
      }
      Multimodal.synthMp4("isom", 1000, 80000L, 1, mdat)
    }
    val media = Seq(
      MediaRecord(1L, "video", clip(0), "t"),
      MediaRecord(2L, "video", clip(5), "t")).toDS()
    // fixed-position fingerprint: the 5-frame shift scatters the
    // Hamming distance far past the near-dup band
    val fp = Multimodal.videoFingerprint(media).toDF()
    val fpPairs = Multimodal
      .dhashNearDupPairs(fp, "media_id", maxHamming = 12).count()
    assert(fpPairs == 0L,
      "position-anchored fingerprint unexpectedly paired a trim")
    // sign-shingle path: the shared 75-frame run survives shingling
    val signs = Multimodal.videoEnergySigns(media)
    val pairs = graft.operators.Dedup.lshNearDupPairs(signs,
        "media_id", "sign_text", n = 16, k = 8, bands = 4,
        minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toList == List((1L, 2L)),
      s"trimmed pair not found by sign shingles: ${pairs.toList}")
  }

  test("probeMp4 still parses headers of an mdat-carrying container") {
    val b = Multimodal.synthMp4("isom", 1000, 65000L, 2,
      Array.tabulate(65 * 256)(_.toByte))
    assert(Multimodal.probeMp4(b).contains(("isom", 65000L, 2)))
    assert(probeOne(b).format == "mp4")
    assert(probeOne(b).duration_ms.contains(65000L))
  }

  test("dHash drops undecodable/sub-grid payloads; identical images collide") {
    val solid = realPng(20, 16, 0x336699) // RGB path, all gradients flat
    val tiny = Multimodal.synthPngGray(8, 8, (x, _) => x * 10)
    val media = Seq(
      MediaRecord(1L, "image", solid, "t"),
      MediaRecord(2L, "image", solid.clone(), "t"),
      MediaRecord(3L, "image", tiny, "t"),
      MediaRecord(4L, "image", "nope".getBytes("UTF-8"), "t")).toDS()
    val hs = Multimodal.dHash(media).collect()
    assert(hs.map(_.media_id).toSet == Set(1L, 2L))
    val h1 = hs.find(_.media_id == 1L).get
    val h2 = hs.find(_.media_id == 2L).get
    assert((h1.h_hi, h1.h_lo) == (h2.h_hi, h2.h_lo))
    assert(h1.h_hi == 0L && h1.h_lo == 0L) // solid fill: no gradients
  }
}
