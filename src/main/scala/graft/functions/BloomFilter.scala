package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Distributed Bloom-filter semi-join pruning — the runtime-filter
  * pattern (a.k.a. sideways information passing) that turns a shuffle
  * join whose probe side is mostly non-matching into a near-scan:
  * aggregate the build side's keys into a fixed-size bit array
  * (mergeable via OR, so map-side partial aggregation applies), ship
  * the few-KB sketch to every probe task via a 1-row broadcast, and
  * drop non-matching probe rows BEFORE the shuffle / join. No false
  * negatives, so `bloom-prune → exact join` returns exactly the plain
  * join's rows; false positives only cost the exact join some extra
  * probe rows. At 100 TB this is the difference between shuffling the
  * full fact table and shuffling the ~matching fraction.
  *
  * Layout of the sketch value (BinaryType): 4-byte big-endian
  * numHashes header, then the bit array (bit i lives at byte
  * `4 + i/8`, bit `i%8`). Bit positions come from Kirsch–Mitzenheimer
  * double hashing over two splitmix64 streams, so insert and probe
  * agree bit-for-bit across the aggregate and the probe expression.
  */
object BloomRuntime {
  /** splitmix64 finalizer (Steele et al., "Fast splittable pseudorandom
    * number generators", OOPSLA'14) — public-domain mixing constants. */
  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val Gold = 0xC2B2AE3D27D4EB4FL

  /** Set the numHashes bits for `key` in a header-less bit array. */
  def set(bits: Array[Byte], numHashes: Int, key: Long): Unit = {
    val nbits = bits.length.toLong << 3
    val h1 = mix(key)
    val h2 = mix(key ^ Gold) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, nbits)
      bits((bit >>> 3).toInt) = (bits((bit >>> 3).toInt) | (1 << (bit & 7).toInt).toByte).toByte
      i += 1
    }
  }

  /** Probe a serialized sketch (4-byte header + bit array). Hot path:
    * called once per probe-side row from generated code. A malformed
    * value rejects everything rather than throwing — SQL users can feed
    * arbitrary binary, so BOTH malformed shapes are guarded: shorter
    * than header + one byte of bits, and a numHashes header outside the
    * [1, 16] range [[BloomFilterAgg]] enforces at build time (a zero or
    * negative header would vacuously accept every key — the filter
    * silently stops pruning — and a huge one, e.g. 2^31, would spin the
    * probe loop per row on a mostly-set sketch). */
  def mightContain(sketch: Array[Byte], key: Long): Boolean = {
    if (sketch.length < 5) return false
    val numHashes = ((sketch(0) & 0xff) << 24) | ((sketch(1) & 0xff) << 16) |
      ((sketch(2) & 0xff) << 8) | (sketch(3) & 0xff)
    if (numHashes < 1 || numHashes > 16) return false
    val nbits = (sketch.length - 4).toLong << 3
    val h1 = mix(key)
    val h2 = mix(key ^ Gold) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, nbits)
      if (((sketch(4 + (bit >>> 3).toInt) >> (bit & 7).toInt) & 1) == 0) return false
      i += 1
    }
    true
  }
}

/** Mergeable Bloom-filter aggregate over a bigint key column: buffer is
  * the raw bit array (OR-merge ⇒ the sketch of the union — partial
  * aggregation and shuffle-side combine are sound), eval() prepends the
  * numHashes header so the probe expression is self-describing.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  require(numBits >= 64 && numBits % 8 == 0,
    s"numBits must be >= 64 and a multiple of 8, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint input, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](numBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomRuntime.set(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Byte](4 + buf.length)
    out(0) = (numHashes >>> 24).toByte
    out(1) = (numHashes >>> 16).toByte
    out(2) = (numHashes >>> 8).toByte
    out(3) = numHashes.toByte
    System.arraycopy(buf, 0, out, 4, buf.length)
    out
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** `graft_bloom_contains(sketch, key)` — probe expression with real
  * codegen (one static call inside whole-stage codegen): this runs once
  * per PROBE-side row, i.e. per fact-table row at 100 TB, so it must not
  * fall back to interpreted dispatch like the per-document sketch
  * kernels do. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(sketch: Any, key: Any): Any =
    BloomRuntime.mightContain(
      sketch.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sketch, key) =>
      s"graft.functions.BloomRuntime.mightContain($sketch, $key)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
