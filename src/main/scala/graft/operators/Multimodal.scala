package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata alongside, and per-item decode /
  * feature-extract runs as batched per-partition imperative code — the
  * Scala analogue of a vectorized (Pandas-style) decode UDF: one decoder
  * instance per partition, items processed in fixed-size batches.
  *
  * The actual media decode is STUBBED ([[MultimodalPipeline.decodeStub]]):
  * no image/audio codecs ship in this environment, so the stub derives
  * deterministic pseudo-features from the raw bytes. The Spark-side
  * plumbing — binary schema, per-partition batching, feature schema — is
  * real and oracle-checked.
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

  /** STUB for the real media decode. A production build would replace
    * this body with an actual codec call (e.g. JPEG decode → (w, h) +
    * features); here it derives deterministic fake dimensions from the
    * payload length so the pipeline stays testable end-to-end.
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
