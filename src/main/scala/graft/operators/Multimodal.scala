package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.C): media as opaque
  * `binary` columns + typed metadata, with partition-batched decode.
  *
  * Two codec paths share the seam:
  *  - the deterministic STUB ([[decode]]/[[resize]] — reads real
  *    bytes, emits fake-but-deterministic features) keeps the gate
  *    replayable over the synthetic corpus;
  *  - the REAL image path ([[decodeImage]]/[[resizeImage]] —
  *    javax.imageio, in-JDK: PNG/BMP/GIF/JPEG) decodes actual
  *    pixels, spec-driven on a generated PNG (MultimodalCodecSpec).
  * Both run the same Spark-side contract — schema, encoders,
  * mapPartitions batching (one codec init per partition, like a
  * Pandas-UDF batch), partition sizing — so swapping stub → real
  * changes no plumbing. Audio/video demux remains stub-only (no
  * in-JDK codec exists for those).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, byte_len: Int, mean_byte: Double,
                           width: Int, height: Int, aspect_q: Double)

  /** Attach a deterministic fake payload + metadata to documents
    * (payload = md5 bytes of the text; metadata derived from doc_id).
    * In production this column comes straight from the lake. */
  def attachPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      unhex(md5(col("text"))).as("payload"),
      ((col("doc_id") % 64) + 16).cast("int").as("width"),
      ((col("doc_id") % 48) + 16).cast("int").as("height"))

  // --- the stubbed decode: deterministic, container-runnable -------
  private def decodeOne(r: MediaRecord): MediaFeatures = {
    // ??? real codec goes here; deterministic fake reads the bytes:
    val len = r.payload.length
    var sum = 0L
    var i = 0
    while (i < len) { sum += (r.payload(i) & 0xff); i += 1 }
    val mean = if (len == 0) 0.0 else sum.toDouble / len
    // half-up rounding (floor(x·scale + .5)) — engine-portable, unlike
    // rint's banker's rounding, so the DuckDB oracle can replicate it
    MediaFeatures(r.doc_id, len, math.floor(mean * 100 + 0.5) / 100,
      r.width, r.height,
      math.floor(r.width.toDouble / r.height * 1000 + 0.5) / 1000)
  }

  /** Partition-batched decode — the mapInPandas-equivalent shape:
    * per-partition init happens once (codec/model load), rows stream
    * through without per-row setup cost. */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      // per-partition "codec init" would run here, once
      it.map(decodeOne)
    }(Encoders.product[MediaFeatures])

  /** End-to-end: documents → payload column → typed dataset →
    * batched decode → features frame. */
  def features(documents: DataFrame): DataFrame = {
    val ds = attachPayload(documents).as[MediaRecord](Encoders.product[MediaRecord])
    decode(ds).toDF()
  }

  // --- the REAL codec path (javax.imageio — in-JDK, no external
  // dependency: PNG/BMP/GIF/JPEG readers ship with the JRE). Same
  // seam, same schemas, same mapPartitions batch shape as the stub;
  // the body decodes actual pixels. The gate keeps the deterministic
  // stub (a synthetic corpus has no real images and the oracle must
  // replay); a deployment whose payload column holds real image
  // bytes swaps decode → decodeImage / resize → resizeImage and
  // nothing upstream or downstream changes (spec-pinned on a
  // generated PNG in MultimodalCodecSpec). ------------------------

  /** Decode real image bytes: dimensions from the decoded frame
    * (metadata width/height are advisory at ingest — the pixels are
    * the truth), mean_byte = mean luminance over all pixels, rounded
    * with the same engine-portable half-up the stub uses. */
  def decodeImage(media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      // per-partition codec init: one cache-mode set per partition
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        // channel sums accumulate UNDIVIDED (a per-pixel (r+g+b)/3 in
        // int arithmetic truncates up to 2/3 per pixel and biases the
        // mean low); one exact division by 3n at the end
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        val mean = if (n == 0) 0.0 else sum.toDouble / (3.0 * n)
        MediaFeatures(r.doc_id, r.payload.length,
          math.floor(mean * 100 + 0.5) / 100,
          img.getWidth, img.getHeight,
          math.floor(img.getWidth.toDouble / img.getHeight * 1000 + 0.5) / 1000)
      }
    }(Encoders.product[MediaFeatures])

  /** Real resize: decode, scale into the (maxW, maxH) bounding box
    * preserving aspect (identical geometry math to the stub), bilinear
    * resample via Graphics2D, re-encode PNG. One codec init per
    * partition; rows stream through. */
  def resizeImage(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[ResizedMedia] =
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        val scale = math.min(1.0,
          math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
        val w = math.max(1, math.floor(img.getWidth * scale).toInt)
        val h = math.max(1, math.floor(img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", buf)
        ResizedMedia(r.doc_id, buf.toByteArray, w, h,
          math.floor(scale * 1000 + 0.5) / 1000)
      }
    }(Encoders.product[ResizedMedia])

  case class ResizedMedia(doc_id: Long, payload: Array[Byte],
                          width: Int, height: Int, scale_q: Double)

  /** Resize pass (stubbed codec): targets a bounding box, preserving
    * aspect ratio — the real geometry math — while the pixel resample
    * is a deterministic fake (payload re-hashed with the new dims, so
    * downstream content-addressing sees a *different* object, exactly
    * like a real resize). Same mapPartitions batch shape as decode. */
  def resize(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[ResizedMedia] =
    media.mapPartitions { it =>
      // per-partition codec init would run here, once
      it.map { r =>
        val scale = math.min(1.0,
          math.min(maxW.toDouble / r.width, maxH.toDouble / r.height))
        val w = math.max(1, math.floor(r.width * scale).toInt)
        val h = math.max(1, math.floor(r.height * scale).toInt)
        // ??? real resample goes here; fake: payload keyed by new dims
        val digest = java.security.MessageDigest.getInstance("MD5")
        digest.update(r.payload)
        digest.update(s":${w}x$h".getBytes("UTF-8"))
        ResizedMedia(r.doc_id, digest.digest(), w, h,
          math.floor(scale * 1000 + 0.5) / 1000)
      }
    }(Encoders.product[ResizedMedia])

  /** Frame sampling (stubbed demux): a "video" doc yields one row per
    * sampled frame — the one-to-many batch shape real frame extraction
    * has. Frame count derives from metadata (doc_id % 10 + 1 here, the
    * duration field in production); every `stride`-th frame is kept and
    * fingerprinted deterministically (md5 of doc_id:frame_idx — the
    * stand-in for the decoded frame's content hash). Row-local
    * projection + explode: no shuffle, embarrassingly parallel at any
    * corpus size. */
  def frameSample(documents: DataFrame, stride: Int): DataFrame =
    documents
      .select(col("doc_id"), ((col("doc_id") % 10) + 1).cast("int").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        md5(concat_ws(":", col("doc_id"), col("frame_idx"))).as("frame_fp"))

  /** Audio chunking (stubbed demux) — frameSample's audio twin: an
    * "audio" doc yields one row per fixed-duration chunk (the window
    * shape ASR/feature pipelines consume), the last chunk truncated
    * at the clip end. Duration derives from metadata (doc_id-keyed
    * here; the real duration field in production); chunk fingerprints
    * stand in for decoded-chunk content hashes. Row-local explode —
    * no shuffle, embarrassingly parallel at any corpus size. */
  def audioChunks(documents: DataFrame, chunkMs: Int): DataFrame =
    documents
      .select(col("doc_id"),
        ((col("doc_id") % 90000) + 1000).cast("long").as("duration_ms"))
      .select(col("doc_id"), col("duration_ms"),
        explode(sequence(lit(0L),
          expr(s"CAST((duration_ms - 1) DIV $chunkMs AS BIGINT)"))).as("chunk_idx"))
      .select(col("doc_id"), col("duration_ms"), col("chunk_idx"),
        (col("chunk_idx") * chunkMs).as("start_ms"),
        least(col("chunk_idx") * chunkMs + chunkMs, col("duration_ms")).as("end_ms"),
        md5(concat_ws(":", col("doc_id"), col("chunk_idx"))).as("chunk_fp"))
}
