package graft.operators

import graft.SparkTestSession
import graft.operators.MultimodalPipeline.{MediaBlob, decodeImage, pngPayload}
import org.scalatest.funsuite.AnyFunSuite

/** The real-codec leg of the multimodal pipeline: JDK ImageIO decode of
  * actual encoded images, with the byte-stub as the fallback for payloads
  * no codec recognises. */
class MultimodalDecodeSpec extends AnyFunSuite with SparkTestSession {

  test("PNG payloads decode to their true dimensions and pixel values") {
    for (id <- Seq(0L, 1L, 16L, 30L, 254L, 255L, 256L, 499L)) {
      val meta = decodeImage(MediaBlob(id, pngPayload(id)))
      assert(meta.real_decode, s"doc $id did not take the codec path")
      assert(meta.width == 1 + (id % 31).toInt)
      assert(meta.height == 1 + (id % 17).toInt)
      assert(meta.mean_gray == (id % 256).toInt)
    }
  }

  test("unrecognised payloads fall back to byte-stub features") {
    val junk = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    val meta = decodeImage(MediaBlob(7L, junk))
    assert(!meta.real_decode)
    assert(meta.width == 64 + (junk.length % 192))
    assert(meta.height == 64 + (junk.length % 128))
    assert(meta.mean_gray == -1)
    // truncated PNG header: codec recognises the magic but must not throw
    val truncated = pngPayload(42L).take(12)
    assert(!decodeImage(MediaBlob(42L, truncated)).real_decode)
  }

  test("distributed decode matches the local decode end-to-end") {
    import spark.implicits._
    val ids = (0L until 64L)
    val blobs = ids.map(id => MediaBlob(id, pngPayload(id))).toDS().repartition(4)
    val got = MultimodalPipeline.decodeImages(blobs)
      .collect().map(m => m.doc_id -> ((m.width, m.height, m.mean_gray))).toMap
    ids.foreach { id =>
      assert(got(id) == ((1 + (id % 31).toInt, 1 + (id % 17).toInt,
        (id % 256).toInt)))
    }
  }
}
