package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.Encoders
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** The REAL codec path (javax.imageio) behind the multimodal seam:
  * decode and resize must run on actual PNG bytes through the same
  * mapPartitions batch shape the stub uses, with pixel-derived
  * features and bounding-box geometry — proving the seam is a seam,
  * not a dead end. Images are generated in-JVM (deterministic
  * gradients), so the spec needs no fixture files. */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  /** A w×h PNG whose pixel (x, y) is the flat gray g — mean luminance
    * is exactly g, so the decoded feature is checkable to the digit. */
  private def grayPng(w: Int, h: Int, g: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private lazy val media = {
    // three real PNGs: dims deliberately disagree with the advisory
    // metadata (the decoder must report pixel truth, not metadata)
    val rows = Seq(
      MediaRecord(1L, grayPng(40, 20, 100), 999, 999),
      MediaRecord(2L, grayPng(16, 64, 0), 999, 999),
      MediaRecord(3L, grayPng(33, 33, 255), 999, 999))
    spark.createDataset(rows)(Encoders.product[MediaRecord])
  }

  test("decodeImage reads real pixels: dims from the frame, exact mean luminance") {
    val out = Multimodal.decodeImage(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).width == 40 && out(1L).height == 20)
    assert(out(2L).width == 16 && out(2L).height == 64)
    assert(out(1L).mean_byte == 100.0)
    assert(out(2L).mean_byte == 0.0)
    assert(out(3L).mean_byte == 255.0)
    assert(out(1L).aspect_q == 2.0)     // 40/20
    assert(out(2L).aspect_q == 0.25)    // 16/64
    assert(out(1L).byte_len > 0)
  }

  test("decodeImage luminance is unbiased on non-gray pixels (no per-pixel integer truncation)") {
    // pixels (1,1,2) and (0,0,0): true mean luminance = 4/6 = 0.666…
    // → 0.67 half-up at 2dp; a per-pixel (r+g+b)/3 int division would
    // truncate to (1+0)/2 = 0.5
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (1 << 16) | (1 << 8) | 2)
    img.setRGB(1, 0, 0)
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, "png", buf)
    val ds = spark.createDataset(Seq(
      MediaRecord(7L, buf.toByteArray, 2, 1)))(Encoders.product[MediaRecord])
    val f = Multimodal.decodeImage(ds).collect().head
    assert(f.mean_byte == 0.67, s"biased mean: ${f.mean_byte}")
  }

  test("resizeImage: bounding-box geometry on real pixels, re-encoded payload decodes at the new dims") {
    val out = Multimodal.resizeImage(media, maxW = 20, maxH = 20).collect()
      .map(r => r.doc_id -> r).toMap
    // 40×20 → fits at scale .5 → 20×10; 16×64 → scale .3125 → 5×20;
    // 33×33 → scale 20/33 → floor(19.99..) = 20×20
    assert((out(1L).width, out(1L).height) == ((20, 10)))
    assert((out(2L).width, out(2L).height) == ((5, 20)))
    assert((out(3L).width, out(3L).height) == ((20, 20)))
    assert(out(1L).scale_q == 0.5)
    // the payload is a REAL re-encoded PNG: decode it back and check
    // both the dims and that flat-gray inputs stay flat-gray (any
    // resample of a constant image is that constant)
    out.values.foreach { r =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(img != null, s"re-encoded payload undecodable for ${r.doc_id}")
      assert(img.getWidth == r.width && img.getHeight == r.height)
    }
    val gray1 = ImageIO.read(new java.io.ByteArrayInputStream(out(1L).payload))
    assert((gray1.getRGB(5, 5) & 0xff) == 100, "flat gray not preserved")
  }

  /** PCM 16-bit WAV bytes from explicit per-frame samples (one Short
    * per frame per channel, little-endian via the JDK's own WAV
    * writer) — header truth and chunk means are checkable to the
    * digit. */
  private def wav(rateHz: Int, channels: Int,
                  frames: Array[Array[Short]]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rateHz.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](frames.length * 2 * channels)
    for ((fr, f) <- frames.zipWithIndex; c <- 0 until channels) {
      val s = fr(c)
      pcm(f * 2 * channels + 2 * c) = (s & 0xff).toByte
      pcm(f * 2 * channels + 2 * c + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.length.toLong)
    val buf = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("decodeAudio reads real headers: rate/channels/frames from the container, not metadata") {
    // 5000 frames @ 8 kHz mono = 625 ms; metadata deliberately wrong
    val mono = wav(8000, 1, Array.fill(5000)(Array[Short](1000)))
    val stereo = wav(16000, 2, Array.fill(1600)(Array[Short](1, -1)))
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, mono, 999, 999),
      MediaRecord(2L, stereo, 999, 999)))(Encoders.product[MediaRecord])
    val out = Multimodal.decodeAudio(ds).collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).sample_rate == 8000 && out(1L).channels == 1)
    assert(out(1L).n_frames == 5000 && out(1L).duration_ms == 625)
    assert(out(2L).sample_rate == 16000 && out(2L).channels == 2)
    assert(out(2L).n_frames == 1600 && out(2L).duration_ms == 100)
  }

  test("audioChunksReal: exact chunk geometry + per-chunk mean amplitude on real samples") {
    // three amplitude plateaus @ 8 kHz, 250 ms chunks = 2000 frames:
    // chunk 0 → 8192/32768 = .25, chunk 1 → .5, chunk 2 (truncated,
    // 1000 frames) → .125; alternating sign proves |amplitude|
    val frames = (Array.fill(2000)(8192) ++ Array.fill(2000)(-16384) ++
      Array.fill(1000)(4096)).map(s => Array(s.toShort))
    val ds = spark.createDataset(Seq(
      MediaRecord(5L, wav(8000, 1, frames), 0, 0)))(Encoders.product[MediaRecord])
    val out = Multimodal.audioChunksReal(ds, chunkMs = 250)
      .collect().sortBy(_.chunk_idx)
    assert(out.length == 3)
    assert(out.forall(_.duration_ms == 625))
    assert(out.map(c => (c.chunk_idx, c.start_ms, c.end_ms)).toSeq ==
      Seq((0L, 0L, 250L), (1L, 250L, 500L), (2L, 500L, 625L)))
    assert(out.map(_.mean_amp).toSeq == Seq(0.25, 0.5, 0.125))
    // stereo channels average into the frame amplitude: (.25+.75)/2
    val st = spark.createDataset(Seq(MediaRecord(6L,
      wav(8000, 2, Array.fill(2000)(Array[Short](8192, -24576))), 0, 0)))(
      Encoders.product[MediaRecord])
    val sOut = Multimodal.audioChunksReal(st, chunkMs = 250).collect()
    assert(sOut.length == 1 && sOut.head.mean_amp == 0.5)
  }

  /** A minimal MJPEG AVI: RIFF('AVI ') → LIST(hdrl){avih,
    * LIST(strl){strh,strf}} → LIST(movi){00dc…}. dwTotalFrames in
    * avih is set DELIBERATELY WRONG (999) — the demuxer must count
    * the movi chunks, not trust the advisory header. */
  private def avi(w: Int, h: Int, rate: Int, scale: Int,
                  frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cc(id) ++ u32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(typ) ++ body)
    val avih = chunk("avih", u32(1000000L * scale / rate) ++ u32(0) ++
      u32(0) ++ u32(0) ++ u32(999) /* wrong on purpose */ ++ u32(0) ++
      u32(1) ++ u32(0) ++ u32(w.toLong) ++ u32(h.toLong) ++ Array.fill(16)(0.toByte))
    val strh = chunk("strh", cc("vids") ++ cc("MJPG") ++ u32(0) ++
      u32(0) /* wPriority+wLanguage */ ++ u32(0) ++ u32(scale.toLong) ++
      u32(rate.toLong) ++ u32(0) ++ u32(frames.length.toLong) ++ u32(0) ++
      u32(0) ++ u32(0) ++ Array.fill(8)(0.toByte) /* rcFrame */)
    val strf = chunk("strf", u32(40) ++ u32(w.toLong) ++ u32(h.toLong) ++
      u32(0x00180001L) /* planes=1, bitcount=24 */ ++ cc("MJPG") ++
      u32(w.toLong * h * 3) ++ Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    out.write(cc("RIFF")); out.write(u32(body.length.toLong)); out.write(body)
    out.toByteArray
  }

  private def grayJpeg(w: Int, h: Int, g: Int, oddPad: Boolean = false): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", buf)
    // force an odd chunk length when asked — the RIFF pad byte the
    // writer then appends must be skipped by the demuxer's even-advance
    val b = buf.toByteArray
    if (oddPad && b.length % 2 == 0) b :+ 0.toByte else b
  }

  test("decodeVideo reads real container headers: dims from strf, fps from strh, frames from movi") {
    // 29.97 fps (30000/1001), 5 frames; avih's dwTotalFrames lies (999)
    val fs = (0 until 5).map(i => grayJpeg(32, 24, 40 * i, oddPad = i == 2))
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, avi(32, 24, 30000, 1001, fs), 999, 999)))(
      Encoders.product[MediaRecord])
    val m = Multimodal.decodeVideo(ds).collect().head
    assert(m.width == 32 && m.height == 24)
    assert(m.fps_q == 29.97)
    assert(m.n_frames == 5, "frame count must come from the movi list, not avih")
    assert(m.duration_ms == 5L * 1001 * 1000 / 30000) // 166 ms
  }

  test("frameSampleReal: stride geometry + decoded pixel truth per kept frame") {
    // 6 flat-gray frames at distinct levels; stride 2 keeps 0,2,4.
    // Flat-field JPEG is DC-only, so decoded luminance stays within
    // quantization distance of the source gray.
    val levels = Seq(10, 60, 110, 160, 210, 250)
    val fs = levels.map(g => grayJpeg(16, 8, g))
    val ds = spark.createDataset(Seq(
      MediaRecord(3L, avi(16, 8, 10, 1, fs), 0, 0)))(
      Encoders.product[MediaRecord])
    val out = Multimodal.frameSampleReal(ds, stride = 2).collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(out.forall(f => f.n_frames == 6 && f.width == 16 && f.height == 8))
    out.zip(Seq(10, 110, 210)).foreach { case (f, g) =>
      assert(math.abs(f.mean_byte - g) <= 2.0,
        s"frame ${f.frame_idx}: decoded mean ${f.mean_byte} far from $g")
    }
    // fingerprints are over DECODED pixels and distinct across levels
    assert(out.map(_.frame_fp).distinct.length == 3)
    assert(out.head.frame_fp.matches("[0-9a-f]{32}"))
  }

  /** An audio-FIRST two-stream AVI: stream 0 is 'auds' (strh +
    * WAVEFORMATEX-shaped strf whose bytes would misread as absurd
    * dims), stream 1 is the MJPEG video; movi interleaves '00wb'
    * audio chunks with '01dc' frames. The demuxer must take dims
    * from the VIDEO strf and frames from stream 1 only. */
  private def aviAudioFirst(w: Int, h: Int, rate: Int, scale: Int,
                            frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cc(id) ++ u32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(typ) ++ body)
    val avih = chunk("avih", u32(1000000L * scale / rate) ++
      Array.fill(52)(0.toByte))
    val strhA = chunk("strh", cc("auds") ++ cc("    ") ++
      Array.fill(48)(0.toByte))
    // WAVEFORMATEX: wFormatTag=1, nChannels=1, nSamplesPerSec=8000 …
    // reading biWidth at +4 of this blob yields 8000 — the misread
    // the stream-aware parser must not make
    val strfA = chunk("strf", u32(0x00010001L) ++ u32(8000L) ++
      u32(16000L) ++ u32(0x00100002L) ++ Array.fill(2)(0.toByte))
    val strhV = chunk("strh", cc("vids") ++ cc("MJPG") ++ u32(0) ++
      u32(0) ++ u32(0) ++ u32(scale.toLong) ++ u32(rate.toLong) ++
      u32(0) ++ u32(frames.length.toLong) ++ u32(0) ++ u32(0) ++ u32(0) ++
      Array.fill(8)(0.toByte))
    val strfV = chunk("strf", u32(40) ++ u32(w.toLong) ++ u32(h.toLong) ++
      u32(0x00180001L) ++ cc("MJPG") ++ u32(w.toLong * h * 3) ++
      Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strhA ++ strfA) ++
      list("strl", strhV ++ strfV))
    val audioChunk = chunk("00wb", Array.fill(64)(0x55.toByte))
    val movi = list("movi",
      frames.flatMap(f => audioChunk ++ chunk("01dc", f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    out.write(cc("RIFF")); out.write(u32(body.length.toLong)); out.write(body)
    out.toByteArray
  }

  test("audio-first two-stream AVI: dims from the VIDEO strf, frames from the video stream only") {
    val fs = Seq(grayJpeg(24, 16, 30), grayJpeg(24, 16, 200))
    val ds = spark.createDataset(Seq(
      MediaRecord(21L, aviAudioFirst(24, 16, 10, 1, fs), 0, 0)))(
      Encoders.product[MediaRecord])
    val m = Multimodal.decodeVideo(ds).collect().head
    assert(m.width == 24 && m.height == 16,
      s"audio strf misread as video dims: ${m.width}x${m.height}")
    assert(m.n_frames == 2, "audio '00wb' chunks counted as frames")
    assert(m.fps_q == 10.0)
    val out = Multimodal.frameSampleReal(ds, stride = 1).collect().sortBy(_.frame_idx)
    assert(out.length == 2 && out.forall(f => f.width == 24 && f.height == 16))
    assert(math.abs(out(0).mean_byte - 30) <= 2 && math.abs(out(1).mean_byte - 200) <= 2)
  }

  test("frame fingerprints address DECODED content: byte-distinct encodings collide cross-video") {
    // the same JPEG with and without a trailing pad byte: different
    // compressed bytes (a bytes-md5 would split them), identical
    // decoded pixels — frame-level dedup must see ONE frame
    val f = grayJpeg(12, 12, 77)
    require(f.length % 2 == 0 || (f :+ 0.toByte).length % 2 == 0)
    val fPadded = f :+ 0.toByte
    val ds = spark.createDataset(Seq(
      MediaRecord(11L, avi(12, 12, 10, 1, Seq(f)), 0, 0),
      MediaRecord(12L, avi(12, 12, 10, 1, Seq(fPadded)), 0, 0)))(
      Encoders.product[MediaRecord])
    val out = Multimodal.frameSampleReal(ds, stride = 1).collect()
    assert(out.length == 2)
    assert(out.map(_.frame_fp).distinct.length == 1,
      "decoded-pixel fingerprints must collide across encodings")
    assert(java.util.Arrays.equals(f, fPadded) == false)
  }

  test("cross-video dedup on real pixels end to end: demux → frame fingerprints → collision → keeper") {
    // the m_phash_dup loop closed on ACTUAL decoded pixels: four real
    // AVIs, where video 2 is video 1's content RE-ENCODED (every frame
    // byte-distinct via the pad trick, pixel-identical), video 4
    // shares only ONE frame with video 1, and video 3 is disjoint.
    // Dedup policy: videos sharing ≥ 2 decoded-frame fingerprints are
    // duplicates; keeper = min doc_id (the exact-dedup keeper policy).
    val a = grayJpeg(20, 12, 30)
    val b = grayJpeg(20, 12, 120)
    val c = grayJpeg(20, 12, 210)
    val d = grayJpeg(20, 12, 90)
    val e = grayJpeg(20, 12, 170)
    def pad(f: Array[Byte]) = f :+ 0.toByte // byte-distinct, pixel-same
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, avi(20, 12, 10, 1, Seq(a, b, c)), 0, 0),
      MediaRecord(2L, avi(20, 12, 10, 1, Seq(pad(a), pad(b), pad(c))), 0, 0),
      MediaRecord(3L, avi(20, 12, 10, 1, Seq(d, e)), 0, 0),
      MediaRecord(4L, avi(20, 12, 10, 1, Seq(a, d)), 0, 0)))(
      Encoders.product[MediaRecord])
    val frames = Multimodal.frameSampleReal(ds, stride = 1).toDF()
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("frame_fp"))
    // banded equi-join on the decoded-pixel fingerprint (never
    // all-pairs — the LSH band-join shape at any corpus size)
    val pairs = frames.as("x").join(frames.as("y"),
        org.apache.spark.sql.functions.col("x.frame_fp")
          === org.apache.spark.sql.functions.col("y.frame_fp") &&
        org.apache.spark.sql.functions.col("x.doc_id")
          < org.apache.spark.sql.functions.col("y.doc_id"))
      .groupBy(org.apache.spark.sql.functions.col("x.doc_id").as("id1"),
        org.apache.spark.sql.functions.col("y.doc_id").as("id2"))
      .count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // re-encoded twin: ALL 3 frames collide despite byte-distinct JPEGs
    assert(pairs((1L, 2L)) == 3L, s"re-encoded twin missed: $pairs")
    // partial overlaps stay below the ≥2 duplicate bar
    assert(pairs.getOrElse((1L, 4L), 0L) == 1L)
    assert(pairs.getOrElse((2L, 4L), 0L) == 1L)
    assert(pairs.getOrElse((3L, 4L), 0L) == 1L) // frame d shared
    val dups = pairs.filter(_._2 >= 2L).keys.toSet
    assert(dups == Set((1L, 2L)), s"duplicate set wrong: $dups")
    // keeper policy: min doc_id keeps, the twin drops
    val keeper = dups.map { case (i, j) => math.min(i, j) }
    assert(keeper == Set(1L))
  }

  test("frameMomentsReal: per-axis slopes recovered on a 2-D ramp; transposed raster swaps them where the mean cannot see it") {
    // v = 20 + 2x + 3y on 24×12 (max 20+46+33 = 99, clip-free) — and
    // its TRANSPOSE on 12×24 (v = 20 + 2y + 3x): identical pixel
    // MULTISETS, so mean_byte is blind to the swap; the first moments
    // are not. JPEG's low-frequency ramp error keeps the slope
    // estimate well inside ±0.15 (the gate band is ±0.5).
    def planeJpeg(w: Int, h: Int, sx: Int, sy: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = 20 + sx * x + sy * y
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val buf = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", buf)
      buf.toByteArray
    }
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, avi(24, 12, 10, 1, Seq(planeJpeg(24, 12, 2, 3))), 0, 0),
      MediaRecord(2L, avi(12, 24, 10, 1, Seq(planeJpeg(12, 24, 3, 2))), 0, 0)))(
      Encoders.product[MediaRecord])
    val out = Multimodal.frameMomentsReal(ds, stride = 1).collect()
      .map(f => f.doc_id -> f).toMap
    val a = out(1L); val b = out(2L)
    // faithful walk: slopes land on the generator's laws
    assert(math.abs(a.slope_x - 2.0) <= 0.15, s"slope_x ${a.slope_x}")
    assert(math.abs(a.slope_y - 3.0) <= 0.15, s"slope_y ${a.slope_y}")
    // the transposed twin: SAME pixel multiset (mean_byte agrees —
    // 20 + 2·(24−1)/2 + 3·(12−1)/2 = 59.5 both ways, within JPEG
    // noise), but the moments come back swapped
    assert(math.abs(a.mean_byte - b.mean_byte) <= 1.0,
      s"means should agree: ${a.mean_byte} vs ${b.mean_byte}")
    assert(math.abs(b.slope_x - 3.0) <= 0.15 &&
      math.abs(b.slope_y - 2.0) <= 0.15,
      s"transposed slopes: ${b.slope_x}, ${b.slope_y}")
    // geometry + mean surface matches frameSampleReal's contract
    assert(a.width == 24 && a.height == 12 && a.n_frames == 1)
    assert(math.abs(a.mean_byte - 59.5) <= 3.0)
  }

  test("an undecodable video payload fails fast with the doc id") {
    val bad = spark.createDataset(Seq(
      MediaRecord(9L, Array[Byte](82, 73, 70, 70), 4, 4)))(Encoders.product[MediaRecord])
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideo(bad).collect()
    }
    assert(e.getCause != null)
    // a TRUNCATED container (valid magic, chunk size past the end)
    // must fail with the doc id too, not a bare bounds exception
    val whole = avi(8, 8, 10, 1, Seq(grayJpeg(8, 8, 50)))
    val cut = spark.createDataset(Seq(
      MediaRecord(10L, whole.take(whole.length - 7), 0, 0)))(
      Encoders.product[MediaRecord])
    val t = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideo(cut).collect()
    }
    assert(t.getCause != null &&
      String.valueOf(t.getCause.getMessage).contains("doc 10"))
  }

  test("an undecodable audio payload fails fast with the doc id") {
    val bad = spark.createDataset(Seq(
      MediaRecord(9L, Array[Byte](9, 9, 9), 4, 4)))(Encoders.product[MediaRecord])
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudio(bad).collect()
    }
    assert(e.getCause != null)
  }

  test("an undecodable payload fails fast with the doc id, not a null row") {
    val bad = spark.createDataset(Seq(
      MediaRecord(9L, Array[Byte](1, 2, 3), 4, 4)))(Encoders.product[MediaRecord])
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImage(bad).collect()
    }
    assert(e.getCause != null)
  }
}
