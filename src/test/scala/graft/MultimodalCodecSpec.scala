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
