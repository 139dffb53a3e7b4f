package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Buffer-level semantics of [[BloomFilterAgg]] + [[BloomMightContain]]:
  * the no-false-negative contract the rel_bloom_join pruning relies on,
  * OR-merge = sketch-of-union (partial aggregation soundness), the
  * serialize/deserialize shuffle roundtrip, and a false-positive-rate
  * sanity bound at the query's parameters.
  */
class BloomFilterSpec extends AnyFunSuite {

  private def agg(bits: Int, hashes: Int) =
    BloomFilterAgg(BoundReference(0, LongType, nullable = true), bits, hashes)

  private def feed(a: BloomFilterAgg, keys: Seq[Long]): Array[Byte] =
    keys.foldLeft(a.createAggregationBuffer()) { (b, k) =>
      a.update(b, InternalRow(k))
    }

  private def sketch(a: BloomFilterAgg, keys: Seq[Long]): Array[Byte] =
    a.eval(feed(a, keys)).asInstanceOf[Array[Byte]]

  test("no false negatives: every inserted key probes true") {
    val a = agg(1 << 12, 7)
    val rnd = new Random(42)
    val keys = Seq.fill(200)(rnd.nextLong())
    val s = sketch(a, keys)
    keys.foreach(k => assert(BloomRuntime.mightContain(s, k), s"lost $k"))
  }

  test("nulls are skipped, empty sketch rejects everything") {
    val a = agg(1 << 12, 7)
    val buf = a.update(a.createAggregationBuffer(), InternalRow(null))
    val s = a.eval(buf).asInstanceOf[Array[Byte]]
    (1L to 100L).foreach(k =>
      assert(!BloomRuntime.mightContain(s, k), s"empty sketch matched $k"))
  }

  test("merge is sketch-of-union: identical to single-pass insertion") {
    val a = agg(1 << 12, 7)
    val left = (1L to 100L).map(_ * 17)
    val right = (1L to 100L).map(_ * 31)
    val merged = a.merge(feed(a, left), feed(a, right))
    val direct = feed(a, left ++ right)
    assert(merged.sameElements(direct))
  }

  test("serialize/deserialize roundtrips the buffer byte-exactly") {
    val a = agg(1 << 12, 7)
    val buf = feed(a, (1L to 50L).map(_ * 997))
    assert(a.deserialize(a.serialize(buf)).sameElements(buf))
  }

  test("false-positive rate at query parameters stays below 1%") {
    // rel_bloom_join ships 2^16 bits / 7 hashes; at sf0.1 the build set
    // is ~3k keys -> theoretical fpp ~ (1-e^{-7*3000/65536})^7 ~ 5e-4.
    // Assert an order-of-magnitude-safe 1% on 10k disjoint probes.
    val a = agg(1 << 16, 7)
    val s = sketch(a, (1L to 3000L).map(BloomRuntime.mix))
    val probes = (1L to 10000L).map(k => BloomRuntime.mix(k + 1000000L))
    val fp = probes.count(BloomRuntime.mightContain(s, _))
    assert(fp < 100, s"fpp too high: $fp/10000")
  }

  test("malformed sketches reject instead of throwing") {
    // SQL users can feed arbitrary binary to graft_bloom_contains
    assert(!BloomRuntime.mightContain(Array.emptyByteArray, 1L))
    assert(!BloomRuntime.mightContain(Array[Byte](0, 0, 0, 7), 1L))
  }

  test("out-of-range numHashes header rejects instead of degrading") {
    // a zero/negative header would make the probe loop vacuous (every
    // key accepted — filter silently stops pruning); a huge header
    // (e.g. 2^31-1) would spin the loop per probe row on a mostly-set
    // sketch. Both must reject, matching the [1,16] build-time range.
    val allSet = Array.fill[Byte](4 + 16)(-1)
    def withHeader(h: Int): Array[Byte] = {
      val s = allSet.clone()
      s(0) = (h >>> 24).toByte; s(1) = (h >>> 16).toByte
      s(2) = (h >>> 8).toByte; s(3) = h.toByte
      s
    }
    assert(!BloomRuntime.mightContain(withHeader(0), 1L))
    assert(!BloomRuntime.mightContain(withHeader(-3), 1L))
    assert(!BloomRuntime.mightContain(withHeader(Int.MaxValue), 1L))
    assert(!BloomRuntime.mightContain(withHeader(17), 1L))
    assert(BloomRuntime.mightContain(withHeader(16), 1L)) // boundary ok
  }

  test("probe expression evals through the interpreted path too") {
    val a = agg(1 << 12, 5)
    val s = sketch(a, Seq(7L, 8L, 9L))
    val expr = BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(s),
      BoundReference(0, LongType, nullable = true))
    assert(expr.eval(InternalRow(8L)) == true)
  }
}
