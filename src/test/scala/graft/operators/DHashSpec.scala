package graft.operators

import graft.SparkTestSession
import graft.operators.MultimodalPipeline.MediaBlob
import org.scalatest.funsuite.AnyFunSuite

/** Pins the dHash step against an independent driver-side replay of the
  * gradient-fixture arithmetic, and the banding scheme's pigeonhole
  * exactness that td_image_dhash_dedup's blocked join relies on. */
class DHashSpec extends AnyFunSuite with SparkTestSession {

  /** Driver-side replay: the expected bands from the doc_id formula,
    * computed WITHOUT any codec (pure arithmetic, the oracle's view). */
  private def expectedBands(id: Long): Seq[Int] = {
    val w = 1 + (id % 31).toInt
    val h = 1 + (id % 17).toInt
    def gray(x: Int, y: Int): Int =
      ((id + x * w / 9 + y * h / 8) % 256).toInt
    val bands = Array.fill(4)(0)
    for (k <- 0 until 64)
      if (gray(k % 8 + 1, k / 8) > gray(k % 8, k / 8))
        bands(k / 16) |= 1 << (k % 16)
    bands.toSeq
  }

  test("decoded dHash matches the arithmetic replay across id regimes") {
    import spark.implicits._
    // ids spanning: no-wrap (all-ones hash), wrap line inside the image,
    // 1-pixel-wide and 1-pixel-tall degenerate dims
    val ids = Seq(0L, 1L, 30L, 31L, 62L, 220L, 254L, 255L, 311L, 499L)
    val blobs = ids
      .map(id => MediaBlob(id, MultimodalPipeline.pngGradientPayload(id)))
      .toDS().repartition(3)
    val got = MultimodalPipeline.dhashImages(blobs).collect()
      .map(m => m.doc_id -> Seq(m.h0, m.h1, m.h2, m.h3)).toMap
    ids.foreach(id => assert(got(id) == expectedBands(id), s"doc $id"))
  }

  test("bands are 16-bit non-negative") {
    import spark.implicits._
    val blobs = (0L until 32L)
      .map(id => MediaBlob(id, MultimodalPipeline.pngGradientPayload(id)))
      .toDS()
    MultimodalPipeline.dhashImages(blobs).collect().foreach { m =>
      Seq(m.h0, m.h1, m.h2, m.h3).foreach { b =>
        assert(b >= 0 && b <= 0xFFFF)
      }
    }
  }

  test("pigeonhole: any hamming<=3 pair shares at least one of 4 bands") {
    // Property of the banding scheme itself, checked exhaustively over
    // all ways to place 3 flipped bits into 4 bands.
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val base = Array.fill(4)(rnd.nextInt(0x10000))
      val flipped = base.clone()
      val nBits = rnd.nextInt(4) // 0..3 flips
      val positions = rnd.shuffle((0 until 64).toList).take(nBits)
      positions.foreach(k => flipped(k / 16) ^= 1 << (k % 16))
      assert((0 until 4).exists(b => base(b) == flipped(b)),
        s"no shared band for flips at $positions")
    }
  }
}
