package graft.operators

import graft.SparkTestSession
import graft.operators.MultimodalPipeline._
import org.scalatest.funsuite.AnyFunSuite

/** The RIFF/WAV codec leg of the multimodal pipeline: byte-level
  * container round trip, chunk-walk robustness (unknown chunks, odd-size
  * padding), and malformed-payload totality.
  */
class WavCodecSpec extends AnyFunSuite with SparkTestSession {

  test("writer → parser round-trips format fields and every sample") {
    for (id <- Seq(0L, 1L, 2L, 3L, 799L, 800L, 801L, 499L)) {
      val a = parseWav(wavPayload(id)).getOrElse(fail(s"doc $id unparsed"))
      assert(a.sampleRate == wavSampleRate(id))
      assert(a.channels == 1 && a.bitsPerSample == 16)
      assert(a.samples.length == wavSampleCount(id))
      a.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s == wavSample(id, i), s"doc $id sample $i")
      }
      // negative samples must survive the 16-bit LE round trip
      assert(a.samples.exists(_ < 0))
    }
  }

  test("parser walks past unknown chunks, honoring the odd-size pad byte") {
    val base = wavPayload(5L)
    // splice a 3-byte (odd) LIST chunk between "WAVE" and "fmt ":
    // payload 3 bytes + 1 pad byte per the RIFF spec
    val inject = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9, 0)
    val spliced = base.take(12) ++ inject ++ base.drop(12)
    val a = parseWav(spliced).getOrElse(fail("spliced chunk broke the walk"))
    assert(a.sampleRate == wavSampleRate(5L))
    assert(a.samples.toSeq == (0 until wavSampleCount(5L)).map(wavSample(5L, _)))
  }

  test("malformed payloads return None instead of throwing") {
    assert(parseWav(Array.emptyByteArray).isEmpty)
    assert(parseWav("RIFFxxxx".getBytes("US-ASCII")).isEmpty) // truncated
    assert(parseWav(wavPayload(9L).take(30)).isEmpty) // data chunk cut off
    val junk = Array.tabulate[Byte](200)(i => (i * 13).toByte)
    assert(parseWav(junk).isEmpty)
    // declared chunk length past the buffer must not read out of bounds
    val lying = wavPayload(9L)
    lying(40) = 127 // inflate the data chunk's declared length byte
    assert(parseWav(lying).isEmpty)
    // non-PCM audioFormat rejects
    val nonPcm = wavPayload(9L).clone()
    nonPcm(20) = 3 // IEEE float format tag
    assert(parseWav(nonPcm).isEmpty)
  }

  test("windowed energy matches a direct single-pass computation") {
    val id = 321L
    val e = MultimodalPipeline
      .audioEnergy(toWavBlobs(sparkDocs(Seq(id))), window = 256)
      .collect().head
    val n = wavSampleCount(id)
    val sq = (0 until n).map(i => { val s = wavSample(id, i).toLong; s * s })
    val wins = sq.grouped(256).map(_.sum).toSeq
    assert(e.n_windows == wins.size.toLong)
    assert(e.total_sq == wins.sum)
    assert(e.peak_sq == wins.max)
    assert(e.peak_win == wins.indexOf(wins.max).toLong)
  }

  private def sparkDocs(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("doc_id")
  }
}
