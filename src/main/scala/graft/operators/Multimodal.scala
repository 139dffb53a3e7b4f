package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata alongside, and per-item decode /
  * feature-extract runs as batched per-partition imperative code — the
  * Scala analogue of a vectorized (Pandas-style) decode UDF: one decoder
  * instance per partition, items processed in fixed-size batches.
  *
  * Image decode is REAL: [[MultimodalPipeline.decodeImage]] runs the
  * JDK's `javax.imageio` codecs (PNG/BMP/GIF/JPEG ship with the JRE) and
  * extracts actual pixel dimensions plus a mean-luminance feature. For
  * payloads no installed codec recognises (and for the audio/video
  * modalities, whose codecs don't ship in the JDK),
  * [[MultimodalPipeline.decodeStub]] remains the documented fallback:
  * deterministic pseudo-features from the raw bytes, keeping the
  * pipeline total over arbitrary payloads.
  */
object MultimodalPipeline {

  /** One media item: id + raw payload bytes. */
  final case class MediaBlob(doc_id: Long, content: Array[Byte])

  /** Extracted metadata/features for one media item. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      sha_hex: String,
      fake_width: Int,
      fake_height: Int)

  /** Batch size for the per-partition decode loop (the "batch shape" a
    * vectorized decode UDF would see). */
  val DecodeBatchSize = 64

  /** Byte-level fallback decode for payloads no installed codec handles
    * (e.g. audio/video in a JDK-only environment): deterministic
    * pseudo-features from the payload length, keeping the pipeline total
    * and testable end-to-end. Image payloads take the real
    * [[decodeImage]] path instead.
    */
  def decodeStub(md: MessageDigest, item: MediaBlob): MediaMeta = {
    md.reset()
    val sha = md.digest(item.content).map("%02x".format(_)).mkString
    MediaMeta(
      item.doc_id,
      item.content.length.toLong,
      sha,
      64 + (item.content.length % 192),
      64 + (item.content.length % 128))
  }

  /** Decode a binary-payload Dataset into per-item features: one digest
    * instance per partition, items processed in [[DecodeBatchSize]]
    * batches. Narrow (no shuffle) — scales with input partitioning. */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      val md = MessageDigest.getInstance("SHA-256")
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map(decodeStub(md, _))
      }
    }
  }

  /** Decoded image features: real pixel dimensions + mean luminance when
    * a JDK codec recognised the payload; length-derived fallback features
    * (and `real_decode = false`) otherwise. */
  final case class ImageMeta(
      doc_id: Long,
      width: Int,
      height: Int,
      mean_gray: Int,
      real_decode: Boolean)

  /** Deterministic tiny PNG for a doc id: solid gray `id % 256`, width
    * `1 + id % 31`, height `1 + id % 17`. PNG is lossless, so a real
    * decode must recover exactly these — which is what lets the DuckDB
    * oracle recompute the decoded features arithmetically from doc_id.
    */
  def pngPayload(docId: Long): Array[Byte] = {
    val w = 1 + (docId % 31).toInt
    val h = 1 + (docId % 17).toInt
    val g = (docId % 256).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** documents → deterministic PNG payload blobs (the image-modality
    * fixture path: real encoded bytes, decodable by any PNG codec). */
  def toPngBlobs(documents: DataFrame): Dataset[MediaBlob] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      ImageIO.setUseCache(false) // in-memory codec I/O, no temp files
      it.map(id => MediaBlob(id, pngPayload(id)))
    }
  }

  /** Real image decode via the JDK's ImageIO codecs; falls back to the
    * byte-stub features (with `real_decode = false`) when no codec
    * recognises the payload. */
  def decodeImage(item: MediaBlob): ImageMeta = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(item.content))
      catch { case _: Exception => null }
    if (img != null && img.getWidth > 0 && img.getHeight > 0) {
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += img.getRGB(x, y) & 0xff; x += 1 }
        y += 1
      }
      ImageMeta(item.doc_id, w, h, (sum / (w.toLong * h)).toInt,
        real_decode = true)
    } else ImageMeta(
      item.doc_id,
      64 + (item.content.length % 192),
      64 + (item.content.length % 128),
      -1,
      real_decode = false)
  }

  /** Batched per-partition image decode — same shape as
    * [[extractFeatures]] but through the real codec path. Narrow (no
    * shuffle); one in-memory codec session per partition. */
  def decodeImages(blobs: Dataset[MediaBlob]): Dataset[ImageMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.grouped(DecodeBatchSize).flatMap(_.map(decodeImage))
    }
  }

  /** Deterministic gradient PNG for a doc id: same dims as
    * [[pngPayload]] but pixel (x, y) carries gray `(id + x + y) % 256` —
    * spatial structure, so a resize's pixel SAMPLING (not just metadata)
    * is oracle-checkable: a fake resize of a solid image would pass, a
    * fake resize of a gradient cannot. */
  def pngGradientPayload(docId: Long): Array[Byte] = {
    val w = 1 + (docId % 31).toInt
    val h = 1 + (docId % 17).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((docId + x + y) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** documents → deterministic gradient-PNG payload blobs. */
  def toGradientPngBlobs(documents: DataFrame): Dataset[MediaBlob] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map(id => MediaBlob(id, pngGradientPayload(id)))
    }
  }

  /** Resize features: fixed output grid + the exact sum of sampled
    * grays (the oracle recomputes it arithmetically). */
  final case class ResizedMeta(
      doc_id: Long, out_w: Int, out_h: Int, gray_sum: Long)

  /** Real decode + deterministic nearest-neighbor resize to
    * `outW × outH`: output pixel (x', y') samples source pixel
    * (⌊x'·w/outW⌋, ⌊y'·h/outH⌋) — the standard NN mapping, exact in
    * integer math both engines replay. Batched per-partition like every
    * decode step; narrow, no shuffle. */
  def resizeImages(blobs: Dataset[MediaBlob], outW: Int, outH: Int)
      : Dataset[ResizedMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.grouped(DecodeBatchSize).flatMap(_.map { b =>
        val img = ImageIO.read(new ByteArrayInputStream(b.content))
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var yy = 0
        while (yy < outH) {
          var xx = 0
          while (xx < outW) {
            sum += img.getRGB(xx * w / outW, yy * h / outH) & 0xff
            xx += 1
          }
          yy += 1
        }
        ResizedMeta(b.doc_id, outW, outH, sum)
      })
    }
  }

  /** documents.text → UTF-8 binary payload column (the stand-in for real
    * media bytes in the synthetic testdata). */
  def toBlobs(documents: DataFrame): Dataset[MediaBlob] = {
    import documents.sparkSession.implicits._
    documents
      // null payloads carry nothing to decode — skip them here rather
      // than NPE inside the per-partition decode loop
      .where(col("text").isNotNull)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      .as[MediaBlob]
  }

  /** Frame-level metadata for a sampled media payload. */
  final case class FrameMeta(
      doc_id: Long,
      n_frames: Long,
      n_sampled: Long,
      first_frame_md5: String,
      sampled_md5: String)

  /** Frame sampling over binary payloads — the video-pipeline shape: chop
    * the payload into fixed-size frames, keep every `stride`-th, digest.
    * Per-partition imperative loop (one digest instance per partition),
    * narrow, no shuffle. The real frame decode would replace the byte
    * slicing; the sampling/batching plumbing is what this exercises. */
  def sampleFrames(blobs: Dataset[MediaBlob], frameSize: Int = 32,
      stride: Int = 4): Dataset[FrameMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      def hex(d: Array[Byte]): String = d.map("%02x".format(_)).mkString
      it.map { b =>
        val n = b.content.length
        val nFrames = (n + frameSize - 1) / frameSize
        val sampled = 0 until nFrames by stride
        md.reset()
        md.update(b.content, 0, math.min(frameSize, n))
        val firstMd5 = hex(md.digest())
        md.reset()
        sampled.foreach { k =>
          md.update(b.content, k * frameSize,
            math.min(frameSize, n - k * frameSize))
        }
        val sampledMd5 = hex(md.digest())
        FrameMeta(b.doc_id, nFrames.toLong, sampled.size.toLong, firstMd5,
          sampledMd5)
      }
    }
  }
}
