package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.MultimodalPipeline
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary payload + batched per-partition
  * feature extraction (see [[graft.operators.MultimodalPipeline]]). The
  * oracle recomputes the stubbed features arithmetically in DuckDB
  * (octet_length / sha256 over the same UTF-8 bytes), proving the Spark
  * plumbing — encode → Dataset[MediaBlob] → mapPartitions decode →
  * typed feature rows — is lossless.
  */
object MultimodalQueries {

  val defs: Map[String, QueryDef] = Map(

    "td_multimodal_meta" -> QueryDef.sql(
      "binary payload → batched mapPartitions decode-stub features")(
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha_hex,
        |  CAST(64 + octet_length(encode(text)) % 192 AS INTEGER) AS fake_width,
        |  CAST(64 + octet_length(encode(text)) % 128 AS INTEGER) AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val blobs = MultimodalPipeline.toBlobs(Tables.load(s, dir, "documents"))
      MultimodalPipeline.extractFeatures(blobs)
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("sha_hex"),
          col("fake_width"), col("fake_height"))
        .orderBy("doc_id")
    },

    // Real codec exercise: deterministic solid-gray PNGs (dims and gray
    // level are functions of doc_id) are encoded then decoded through the
    // JDK's ImageIO, so the oracle recomputes the decoded width/height/
    // mean-luminance arithmetically — a wrong or skipped decode cannot
    // hash-match.
    "td_multimodal_decode" -> QueryDef.sql(
      "real ImageIO decode of deterministic PNG payloads")(
      """SELECT doc_id,
        |  CAST(1 + doc_id % 31 AS INTEGER) AS width,
        |  CAST(1 + doc_id % 17 AS INTEGER) AS height,
        |  CAST(doc_id % 256 AS INTEGER) AS mean_gray,
        |  true AS real_decode
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val blobs = MultimodalPipeline.toPngBlobs(Tables.load(s, dir, "documents"))
      MultimodalPipeline.decodeImages(blobs)
        .toDF()
        .orderBy("doc_id")
    },

    // Resize: gradient PNGs (pixel gray = (id+x+y) % 256) decoded and
    // nearest-neighbor-resized to 8×8; the oracle recomputes the exact
    // sampled-gray sum from the NN index mapping, so skipping either the
    // decode or the per-pixel sampling cannot hash-match.
    "td_multimodal_resize" -> QueryDef.sql(
      "real decode + deterministic nearest-neighbor resize to 8x8")(
      """SELECT doc_id,
        |  CAST(8 AS INTEGER) AS out_w, CAST(8 AS INTEGER) AS out_h,
        |  CAST(list_sum(list_transform(range(64), k ->
        |    (doc_id + ((k % 8) * (1 + doc_id % 31)) // 8
        |            + ((k // 8) * (1 + doc_id % 17)) // 8) % 256))
        |    AS BIGINT) AS gray_sum
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val blobs =
        MultimodalPipeline.toGradientPngBlobs(Tables.load(s, dir, "documents"))
      MultimodalPipeline.resizeImages(blobs, 8, 8)
        .toDF()
        .orderBy("doc_id")
    },

    // Real audio codec exercise (the audio sibling of td_multimodal_decode):
    // deterministic mono PCM16 WAVs — sample count/rate/values are integer
    // functions of doc_id — are written as real RIFF containers and parsed
    // back by the chunk-walking parser in MultimodalPipeline; the oracle
    // recomputes the decoded format fields and exact floor-div duration
    // arithmetically, so a skipped or wrong byte-level parse cannot match.
    "td_audio_meta" -> QueryDef.sql(
      "real RIFF/WAV parse of deterministic PCM16 payloads → format metadata")(
      """SELECT doc_id,
        |  CAST(8000 + 1000 * (doc_id % 3) AS INTEGER) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(800 + doc_id % 800 AS BIGINT) AS n_samples,
        |  CAST((800 + doc_id % 800) * 1000000
        |    // (8000 + 1000 * (doc_id % 3)) AS BIGINT) AS duration_us,
        |  true AS real_decode
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val blobs =
        MultimodalPipeline.toWavBlobs(Tables.load(s, dir, "documents"))
      MultimodalPipeline.decodeAudio(blobs)
        .toDF()
        .orderBy("doc_id")
    },

    // Windowed audio energy: the decoded PCM stream cut into 256-sample
    // windows, per-window Σ s² in exact Long arithmetic (|s| < 2^15, so a
    // window sums to < 2^38), reported per doc as total energy + argmax
    // window (ties to the earliest). The oracle regenerates the identical
    // pseudo-noise samples from the doc_id formula and replays the same
    // integer reduction — feature extraction, not just container fields,
    // is what's hash-pinned here.
    "td_audio_energy" -> QueryDef.sql(
      "256-sample-window PCM energy features in exact integer math")(
      """WITH p AS (SELECT doc_id, 800 + doc_id % 800 AS n FROM documents),
        |s AS (SELECT doc_id, t.i AS i,
        |        ((doc_id*2654435761 + t.i*40503) % 65536) - 32768 AS v
        |      FROM p, unnest(range(n)) AS t(i)),
        |w AS (SELECT doc_id, i // 256 AS win, sum(v*v) AS sq
        |      FROM s GROUP BY 1, 2),
        |a AS (SELECT doc_id, count(*) AS n_windows,
        |        CAST(sum(sq) AS BIGINT) AS total_sq FROM w GROUP BY 1),
        |pk AS (SELECT doc_id, win AS peak_win, CAST(sq AS BIGINT) AS peak_sq
        |       FROM (SELECT doc_id, win, sq, row_number() OVER (
        |           PARTITION BY doc_id ORDER BY sq DESC, win) AS rn
        |         FROM w) WHERE rn = 1)
        |SELECT a.doc_id, a.n_windows, a.total_sq, pk.peak_win, pk.peak_sq
        |FROM a JOIN pk ON a.doc_id = pk.doc_id ORDER BY a.doc_id""".stripMargin) {
      (s, dir) =>
      val blobs =
        MultimodalPipeline.toWavBlobs(Tables.load(s, dir, "documents"))
      MultimodalPipeline.audioEnergy(blobs)
        .toDF()
        .orderBy("doc_id")
    },

    // Frame sampling: 32-byte frames, every 4th kept, digests of the
    // first and of the sampled concatenation. Payloads are ASCII, so the
    // oracle's char-based substr slicing equals the byte slicing.
    "td_multimodal_frames" -> QueryDef.sql(
      "fixed-size frame split + stride sampling over binary payloads")(
      """WITH f AS (SELECT doc_id, text,
        |             CAST((length(text) + 31) // 32 AS BIGINT) AS n_frames
        |           FROM documents)
        |SELECT doc_id, n_frames,
        |  CAST((n_frames + 3) // 4 AS BIGINT) AS n_sampled,
        |  md5(substr(text, 1, 32)) AS first_frame_md5,
        |  md5(array_to_string(list_transform(
        |    list_filter(range(n_frames), k -> k % 4 = 0),
        |    k -> substr(text, CAST(k*32 + 1 AS INTEGER), 32)), ''))
        |    AS sampled_md5
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val blobs = MultimodalPipeline.toBlobs(Tables.load(s, dir, "documents"))
      MultimodalPipeline.sampleFrames(blobs)
        .toDF()
        .orderBy("doc_id")
    }
  )
}
