package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom typed aggregates (the `TypedImperativeAggregate` surface) for
  * mergeable sketches. Both are deterministic and exactly replayed by
  * DuckDB oracles — sketch *machinery* with exact cross-engine checks.
  */

/** Element-wise min over `array<long>` MinHash signatures. Because
  * min-of-mins is the MinHash of the set union, aggregating per-document
  * signatures yields the signature of the whole group's shingle set —
  * the standard mergeable-sketch property. Buffer is a fixed k-long
  * array; partial aggregation (map-side combine) works like any sum.
  */
case class MinHashUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  // analysis-time rejection of non-array<long> children (a wrong-typed
  // SQL call would otherwise CCE at runtime inside update())
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(k, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_union"

  override def withNewMutableAggBufferOffset(o: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MinHashUnionAgg =
    copy(child = newChild)
}

/** Linear-counting-style bitmap sketch: sets bit (hash mod m) per input
  * long, evaluates to the number of occupied buckets. Deterministic given
  * the cross-engine hash, so the oracle is
  * `count(DISTINCT hash % m)` — exact machinery check, mergeable via OR.
  */
case class BitmapDistinctAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(m % 64 == 0, "m must be a multiple of 64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint input, got ${other.sql}")
  }

  private val nWords = m / 64

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bucket = ((v.asInstanceOf[Long] % m + m) % m).toInt
      buf(bucket >> 6) |= 1L << (bucket & 63)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nWords) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0
    var i = 0
    while (i < nWords) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nWords)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nWords)(bb.getLong())
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_distinct"

  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinctAgg =
    copy(child = newChild)
}

/** Bottom-k-by-key sample: keeps the k smallest (key, payload) pairs
  * per group — with key = a uniform hash of the row, this is the
  * standard DISTRIBUTED UNIFORM SAMPLE without replacement (bottom-k
  * sketch): mergeable (union then trim), O(k) state per group, and —
  * unlike rand()-based sampling — fully deterministic, so the sample is
  * reproducible across runs/engines and the DuckDB oracle replays it
  * with a row_number over the same hash. Also the mergeable core of
  * KMV distinct estimation (the k-th smallest hash estimates
  * cardinality).
  *
  * eval() returns `array<struct<key,payload>>` ascending by
  * (key, payload).
  */
case class BottomKByKeyAgg(
    keyChild: Expression,
    payloadChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Long, Long)]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
  require(k > 0, s"k must be positive, got $k")

  // max-heap on (key, payload): the head is the CURRENT worst kept pair
  private type Buf = scala.collection.mutable.PriorityQueue[(Long, Long)]
  private val ord: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Long)

  override def left: Expression = keyChild
  override def right: Expression = payloadChild

  override def checkInputDataTypes(): TypeCheckResult =
    (keyChild.dataType, payloadChild.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${a.sql}, ${b.sql})")
    }

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord)

  private def insert(buf: Buf, e: (Long, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }

  override def update(buf: Buf, input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val kv = keyChild.eval(input)
    val pv = payloadChild.eval(input)
    if (kv != null && pv != null)
      insert(buf, (kv.asInstanceOf[Long], pv.asInstanceOf[Long]))
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.toSeq.sorted(ord).map { case (h, p) =>
      org.apache.spark.sql.catalyst.InternalRow(h, p)
    })

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.toSeq
    val bb = ByteBuffer.allocate(4 + 16 * entries.size)
    bb.putInt(entries.size)
    entries.foreach { case (h, p) => bb.putLong(h); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt()
    (0 until n).foreach(_ => buf.enqueue((bb.getLong(), bb.getLong())))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottomk_sample"

  override def withNewMutableAggBufferOffset(o: Int): BottomKByKeyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKByKeyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKByKeyAgg =
    copy(keyChild = newLeft, payloadChild = newRight)
}

/** SpaceSaving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams", ICDT'05;
  * merge rule per Agarwal et al., "Mergeable Summaries", PODS'12):
  * tracks at most `capacity` counters; an untracked item evicts the
  * current minimum counter and inherits its count (+1) with that count
  * recorded as the new counter's overestimation error. Guarantees after
  * any stream of N items: every item with true frequency > N/capacity is
  * tracked, and each reported count overestimates by at most its `err`
  * (≤ N/capacity). Merging two summaries sums matching counters (counts
  * AND errors) and prunes back to the top `capacity` — the error bounds
  * add, so partial aggregation / map-side combine stays sound. State is
  * O(capacity) per group regardless of input size: the bounded
  * replacement for exact per-group `count(*)` term frequencies at
  * 100 TB.
  *
  * eval() returns the top `n` tracked entries as
  * `array<struct<term,cnt,err>>` ordered by (cnt DESC, term ASC). With
  * `capacity` ≥ the group's distinct-item count no eviction ever fires,
  * all errors are 0 and counts are exact — the mode the DuckDB oracle
  * replays; eviction/error semantics are pinned by SketchAggregatesSpec
  * at capacity 2.
  */
case class SpaceSavingTopKAgg(
    child: Expression,
    capacity: Int,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Array[Long]]]
  with UnaryLike[Expression] {
  require(capacity > 0 && n > 0 && n <= capacity,
    s"need 0 < n <= capacity, got n=$n capacity=$capacity")

  private type Buf = scala.collection.mutable.HashMap[String, Array[Long]]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      buf.get(term) match {
        case Some(ce) => ce(0) += 1
        case None if buf.size < capacity => buf(term) = Array(1L, 0L)
        case None =>
          // evict the min counter; ties broken on term for determinism.
          // O(capacity) scan — evictions only fire once the group's
          // distinct count exceeds capacity, and capacity is small.
          var minK: String = null
          var minC = Long.MaxValue
          buf.foreach { case (k, a) =>
            if (a(0) < minC || (a(0) == minC && (minK == null || k < minK))) {
              minC = a(0); minK = k
            }
          }
          buf.remove(minK)
          buf(term) = Array(minC + 1, minC)
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (k, ce) =>
      a.get(k) match {
        case Some(ae) => ae(0) += ce(0); ae(1) += ce(1)
        case None => a(k) = ce.clone()
      }
    }
    if (a.size > capacity) {
      // prune to the top `capacity` by (count desc, term asc); dropped
      // counters lose their (bounded) mass — the PODS'12 merge.
      val keep = a.toSeq.sortBy { case (k, ce) => (-ce(0), k) }.take(capacity)
      a.clear()
      keep.foreach { case (k, ce) => a(k) = ce }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val top = buf.toSeq.sortBy { case (k, ce) => (-ce(0), k) }.take(n)
    new GenericArrayData(top.map { case (k, ce) =>
      org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(k), ce(0), ce(1))
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.toSeq.map { case (k, ce) =>
      (UTF8String.fromString(k).getBytes, ce(0), ce(1))
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 20).sum)
    bb.putInt(entries.size)
    entries.foreach { case (kb, c, e) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buf
    val sz = bb.getInt()
    var i = 0
    while (i < sz) {
      val kb = new Array[Byte](bb.getInt()); bb.get(kb)
      buf(UTF8String.fromBytes(kb).toString) = Array(bb.getLong(), bb.getLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_spacesaving_topk"

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopKAgg =
    copy(child = newChild)
}
