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
        require(img != null, s"undecodable image blob for doc ${b.doc_id}")
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

  /** Perceptual difference-hash of an image, as four 16-bit bands
    * (h0 = bits 0-15 … h3 = bits 48-63 of the canonical 64-bit dHash).
    * Band-valued output serves the LSH-style bucket join directly and
    * sidesteps 64-bit sign pitfalls in cross-engine bit math. */
  final case class DHashMeta(doc_id: Long, h0: Int, h1: Int, h2: Int, h3: Int)

  /** Real decode + dHash (difference hash, the standard perceptual
    * image fingerprint): NN-downsample the decoded image to a 9×8 gray
    * grid — same ⌊x'·w/outW⌋ mapping as [[resizeImages]] — then bit
    * k = 8·y + x is set iff gray(x+1, y) > gray(x, y), giving 8
    * horizontal comparisons per row × 8 rows = 64 bits. Gradient
    * direction is brightness- and scale-invariant, so re-encoded or
    * resized copies hash to small Hamming distance. Batched
    * per-partition decode; narrow, no shuffle. */
  def dhashImages(blobs: Dataset[MediaBlob]): Dataset[DHashMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.grouped(DecodeBatchSize).flatMap(_.map { b =>
        val img = ImageIO.read(new ByteArrayInputStream(b.content))
        require(img != null, s"undecodable image blob for doc ${b.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        val g = Array.ofDim[Int](8, 9)
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 9) {
            g(yy)(xx) = img.getRGB(xx * w / 9, yy * h / 8) & 0xff
            xx += 1
          }
          yy += 1
        }
        val bands = Array.fill(4)(0)
        var k = 0
        while (k < 64) {
          if (g(k / 8)(k % 8 + 1) > g(k / 8)(k % 8))
            bands(k / 16) |= 1 << (k % 16)
          k += 1
        }
        DHashMeta(b.doc_id, bands(0), bands(1), bands(2), bands(3))
      })
    }
  }

  // ---------------------------------------------------------------------
  // AUDIO: a real RIFF/WAV PCM codec in pure JDK code. The container
  // round-trips byte-for-byte — a writer emitting canonical 44-byte-header
  // mono PCM16 and a chunk-walking parser (handles unknown chunks and odd-
  // size padding per the RIFF spec) — and the samples are deterministic
  // integer pseudo-noise, so the DuckDB oracle recomputes every decoded
  // feature arithmetically from doc_id: a skipped or wrong byte-level
  // parse cannot hash-match, exactly like the PNG decode path above.

  /** Deterministic mono PCM16 fixture parameters for a doc id: sample
    * count 800 + id%800, sample rate 8000 + 1000·(id%3), sample i =
    * ((id·2654435761 + i·40503) mod 65536) − 32768 (Knuth multiplicative
    * mixing — all positive before the mod, exact in BIGINT both engines). */
  def wavSampleCount(docId: Long): Int = (800 + docId % 800).toInt
  def wavSampleRate(docId: Long): Int = (8000 + 1000 * (docId % 3)).toInt
  def wavSample(docId: Long, i: Int): Int =
    (((docId * 2654435761L + i * 40503L) % 65536L) - 32768L).toInt

  /** Canonical WAV bytes: RIFF header + "fmt " (PCM, mono, 16-bit) +
    * "data" chunk, all little-endian. */
  def wavPayload(docId: Long): Array[Byte] = {
    val n = wavSampleCount(docId)
    val rate = wavSampleRate(docId)
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(1) // PCM, mono
    buf.putInt(rate).putInt(rate * 2) // byte rate = rate * blockAlign
    buf.putShort(2).putShort(16) // blockAlign, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort(wavSample(docId, i).toShort); i += 1 }
    buf.array()
  }

  /** A parsed WAV payload: format fields + PCM samples (mono 16-bit). */
  final case class WavAudio(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int])

  /** Chunk-walking RIFF parser: validates RIFF/WAVE magic, scans chunks
    * (skipping unknown ones, honoring the RIFF odd-size pad byte) for
    * "fmt " and "data", and decodes little-endian PCM16 samples. Returns
    * None on anything malformed — truncated header, missing chunks,
    * non-PCM format — so the pipeline stays total over arbitrary bytes. */
  def parseWav(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes.length < 12) return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    buf.getInt // declared RIFF size — trust the actual buffer instead
    if (tag() != "WAVE") return None
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[(Int, Int)] = None // offset, length
    while (buf.remaining() >= 8) {
      val id = tag()
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return None
      val at = buf.position()
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = buf.getShort()
          val channels = buf.getShort()
          val rate = buf.getInt()
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort()
          if (audioFormat != 1) return None // PCM only
          fmt = Some((channels, rate, bits))
        case "data" => data = Some((at, len))
        case _ => // unknown chunk: skip
      }
      buf.position(at + len + (len & 1)) // odd chunks carry a pad byte
    }
    for ((channels, rate, bits) <- fmt; (off, len) <- data;
        if bits == 16 && channels >= 1) yield {
      val n = len / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) =
          ((bytes(off + 2 * i) & 0xff) |
            (bytes(off + 2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      WavAudio(rate, channels, bits, samples)
    }
  }

  /** documents → deterministic WAV payload blobs (real RIFF bytes). */
  def toWavBlobs(documents: DataFrame): Dataset[MediaBlob] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaBlob(id, wavPayload(id))))
  }

  /** Decoded audio metadata; `duration_us` is exact floor-division
    * micro-seconds, so it cross-checks in integer math. */
  final case class AudioMeta(
      doc_id: Long, sample_rate: Int, channels: Int, n_samples: Long,
      duration_us: Long, real_decode: Boolean)

  /** Batched per-partition WAV parse → metadata; fallback features with
    * `real_decode = false` for unparseable payloads. Narrow, no shuffle. */
  def decodeAudio(blobs: Dataset[MediaBlob]): Dataset[AudioMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions {
      _.grouped(DecodeBatchSize).flatMap(_.map { b =>
        parseWav(b.content) match {
          case Some(a) =>
            AudioMeta(b.doc_id, a.sampleRate, a.channels,
              a.samples.length.toLong,
              a.samples.length.toLong * 1000000L / a.sampleRate,
              real_decode = true)
          case None =>
            AudioMeta(b.doc_id, -1, 0, b.content.length.toLong, -1L,
              real_decode = false)
        }
      })
    }
  }

  /** Windowed energy features over the decoded PCM stream: per fixed
    * window of `window` samples, energy = Σ s² (≤ 2^30 per sample, exact
    * in Long); reported per doc as total + argmax window (ties to the
    * earliest window). */
  final case class AudioEnergy(
      doc_id: Long, n_windows: Long, total_sq: Long, peak_win: Long,
      peak_sq: Long)

  /** Parse + window + energy in one narrow per-partition pass — the
    * audio analogue of [[resizeImages]]'s decode-then-feature shape. */
  def audioEnergy(blobs: Dataset[MediaBlob], window: Int = 256)
      : Dataset[AudioEnergy] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions {
      _.grouped(DecodeBatchSize).flatMap(_.flatMap { b =>
        parseWav(b.content).map { a =>
          val n = a.samples.length
          val nWin = (n + window - 1) / window
          var total = 0L
          var peakWin = 0L
          var peakSq = -1L
          var w = 0
          while (w < nWin) {
            var sq = 0L
            var i = w * window
            val end = math.min(n, i + window)
            while (i < end) {
              val s = a.samples(i).toLong; sq += s * s; i += 1
            }
            if (sq > peakSq) { peakSq = sq; peakWin = w.toLong }
            total += sq
            w += 1
          }
          AudioEnergy(b.doc_id, nWin.toLong, total, peakWin, peakSq)
        }
      })
    }
  }

  // ---------------------------------------------------------------------
  // VIDEO: a real AVI container codec, same discipline as the WAV leg.
  // The writer emits a spec-conformant RIFF 'AVI ' file — LIST hdrl
  // (avih + LIST strl with strh/strf + 256-entry gray palette), LIST movi
  // with one '00db' raw-DIB chunk per frame, and an idx1 index — and the
  // parser is a recursive LIST walker that recovers format fields from the
  // headers and every frame payload from movi. Frame pixels are
  // deterministic integer pseudo-noise over (doc_id, frame, pixel), so the
  // DuckDB oracle replays both the header arithmetic and the per-frame
  // pixel sums: a parse that misses a chunk or misreads a byte cannot
  // hash-match.

  /** Deterministic AVI fixture parameters for a doc id. Width is a
    * multiple of 4 so the 8-bit DIB rows need no padding (row stride =
    * width exactly, per the BMP 4-byte-alignment rule). */
  def aviWidth(docId: Long): Int = (8 + 4 * (docId % 3)).toInt
  def aviHeight(docId: Long): Int = (6 + docId % 7).toInt
  def aviFrameCount(docId: Long): Int = (4 + docId % 13).toInt
  def aviFps(docId: Long): Int = (10 + docId % 5).toInt

  /** Pixel `p` (row-major) of frame `f`: `(id·2654435761 + f·97 + p·31)
    * mod 256` — all positive before the mod, exact in BIGINT. */
  def aviPixel(docId: Long, f: Int, p: Int): Int =
    ((docId * 2654435761L + f * 97L + p * 31L) % 256L).toInt

  /** Canonical AVI bytes: RIFF('AVI ') → LIST hdrl(avih, LIST strl(strh
    * 'vids'/'DIB ', strf BITMAPINFOHEADER + gray palette)) → LIST movi
    * ('00db' × frames) → idx1. All sizes exact, all fields little-endian. */
  def aviPayload(docId: Long): Array[Byte] = {
    val w = aviWidth(docId)
    val h = aviHeight(docId)
    val nf = aviFrameCount(docId)
    val fps = aviFps(docId)
    val frameLen = w * h // 8-bit gray, width % 4 == 0 → no row padding
    val strlLen = 4 + (8 + 56) + (8 + 40 + 1024)
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen)
    val moviLen = 4 + nf * (8 + frameLen)
    val idx1Len = 16 * nf
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen) + (8 + idx1Len)
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffLen); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps).putInt(fps * frameLen).putInt(0)
      .putInt(0x10) // AVIF_HASINDEX
      .putInt(nf).putInt(0).putInt(1).putInt(frameLen)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(strlLen); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps) // dwScale=1, dwRate=fps
      .putInt(0).putInt(nf).putInt(frameLen).putInt(0).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); buf.putInt(40 + 1024)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(8)
      .putInt(0).putInt(frameLen).putInt(0).putInt(0)
      .putInt(256).putInt(0)
    var g = 0
    while (g < 256) { // grayscale RGBQUAD palette: b, g, r, reserved
      buf.put(g.toByte).put(g.toByte).put(g.toByte).put(0.toByte); g += 1
    }
    fourcc("LIST"); buf.putInt(moviLen); fourcc("movi")
    var f = 0
    while (f < nf) {
      fourcc("00db"); buf.putInt(frameLen)
      var p = 0
      while (p < frameLen) { buf.put(aviPixel(docId, f, p).toByte); p += 1 }
      f += 1
    }
    fourcc("idx1"); buf.putInt(idx1Len)
    f = 0
    while (f < nf) { // ckid, AVIIF_KEYFRAME, offset within movi, size
      fourcc("00db"); buf.putInt(0x10)
      buf.putInt(4 + f * (8 + frameLen)).putInt(frameLen)
      f += 1
    }
    buf.array()
  }

  /** A parsed AVI: header fields + raw frame payloads from movi. */
  final case class AviVideo(
      width: Int, height: Int, rate: Int, scale: Int,
      frames: Array[Array[Byte]])

  /** Recursive RIFF LIST walker: validates RIFF/'AVI ' magic, descends
    * into hdrl/strl/movi lists, reads avih (dims) and the 'vids' strh
    * (scale/rate), collects every '00db'/'00dc' frame chunk, skips
    * unknown chunks (JUNK, idx1, …) honoring the odd-size pad byte.
    * Returns None on malformed input — bad magic, out-of-bounds declared
    * lengths, missing headers, empty movi, or any frame whose length
    * isn't width·height (the raw 8-bit DIB contract). */
  def parseAvi(bytes: Array[Byte]): Option[AviVideo] = {
    if (bytes.length < 12) return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    buf.getInt // declared RIFF size — trust the actual buffer instead
    if (tag() != "AVI ") return None
    var width = -1; var height = -1
    var rate = -1; var scale = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(end: Int): Boolean = {
      while (buf.position() + 8 <= end) {
        val id = tag()
        val len = buf.getInt
        if (len < 0 || buf.position() + len > end) return false
        val at = buf.position()
        id match {
          case "LIST" =>
            if (len < 4) return false
            val listType = tag()
            if (listType == "hdrl" || listType == "strl" ||
                listType == "movi") {
              if (!walk(at + len)) return false
            }
          case "avih" =>
            if (len < 40) return false
            buf.position(at + 32) // dwWidth is the 9th dword
            width = buf.getInt
            height = buf.getInt
          case "strh" =>
            if (len < 36) return false
            if (tag() == "vids") {
              buf.position(at + 20) // skip handler/flags/prio/lang/init
              scale = buf.getInt
              rate = buf.getInt
            }
          case "00db" | "00dc" =>
            frames += java.util.Arrays.copyOfRange(bytes, at, at + len)
          case _ => // unknown chunk (JUNK, idx1, …): skip
        }
        buf.position(at + len + (len & 1)) // odd chunks carry a pad byte
      }
      true
    }
    if (!walk(bytes.length)) return None
    if (width <= 0 || height <= 0 || rate <= 0 || scale <= 0 ||
        frames.isEmpty || frames.exists(_.length != width * height)) None
    else Some(AviVideo(width, height, rate, scale, frames.toArray))
  }

  /** documents → deterministic AVI payload blobs (real RIFF bytes). */
  def toAviBlobs(documents: DataFrame): Dataset[MediaBlob] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaBlob(id, aviPayload(id))))
  }

  /** Decoded video metadata; `fps` is rate/scale (scale pinned 1 by the
    * writer) and `duration_us` exact floor-division micro-seconds. */
  final case class VideoMeta(
      doc_id: Long, width: Int, height: Int, n_frames: Long, fps: Int,
      duration_us: Long, real_decode: Boolean)

  /** Batched per-partition AVI parse → metadata; fallback row with
    * `real_decode = false` for unparseable payloads. Narrow, no shuffle. */
  def decodeVideo(blobs: Dataset[MediaBlob]): Dataset[VideoMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions {
      _.grouped(DecodeBatchSize).flatMap(_.map { b =>
        parseAvi(b.content) match {
          case Some(v) =>
            val nf = v.frames.length.toLong
            VideoMeta(b.doc_id, v.width, v.height, nf,
              v.rate / v.scale,
              nf * 1000000L * v.scale / v.rate,
              real_decode = true)
          case None =>
            VideoMeta(b.doc_id, -1, -1, b.content.length.toLong, -1, -1L,
              real_decode = false)
        }
      })
    }
  }

  /** Stride-sampled frame features over REAL decoded frames: every
    * `stride`-th frame's pixel sum (unsigned gray bytes, exact in Long),
    * total over the sample, and the argmax sampled frame (ties to the
    * earliest). The video analogue of [[audioEnergy]]. */
  final case class VideoFrames(
      doc_id: Long, n_frames: Long, n_sampled: Long, sampled_sum: Long,
      peak_frame: Long, peak_sum: Long)

  def sampleVideoFrames(blobs: Dataset[MediaBlob], stride: Int = 3)
      : Dataset[VideoFrames] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions {
      _.grouped(DecodeBatchSize).flatMap(_.flatMap { b =>
        parseAvi(b.content).map { v =>
          var total = 0L
          var peakFrame = -1L
          var peakSum = -1L
          var sampled = 0L
          var f = 0
          while (f < v.frames.length) {
            if (f % stride == 0) {
              val frame = v.frames(f)
              var sum = 0L
              var p = 0
              while (p < frame.length) { sum += frame(p) & 0xff; p += 1 }
              if (sum > peakSum) { peakSum = sum; peakFrame = f.toLong }
              total += sum
              sampled += 1
            }
            f += 1
          }
          VideoFrames(b.doc_id, v.frames.length.toLong, sampled, total,
            peakFrame, peakSum)
        }
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
