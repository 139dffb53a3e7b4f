package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass a text
  * pipeline runs before hashing/dedup so that visually-identical strings
  * ("é" composed vs "e" + U+0301 combining acute) get identical digests.
  * Spark has no built-in; this wraps `java.text.Normalizer` as a
  * codegen'd expression (DuckDB replays it as `nfc_normalize`, and both
  * implement Unicode canonical composition, so outputs agree
  * byte-for-byte).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC));""".stripMargin)

  override def prettyName: String = "graft_nfc"
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Runtime for [[LevenshteinLe]] — static so generated code can call it
  * without holding an expression reference. */
object LevRuntime {

  private def codePoints(u: UTF8String): Array[Int] = {
    val s = u.toString
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var n = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      out(n) = c
      n += 1
      i += Character.charCount(c)
    }
    out
  }

  /** Exact Levenshtein distance when it is <= k, else -1. Exact for
    * ARBITRARY inputs: common prefix/suffix trimming preserves edit
    * distance (any optimal alignment matches equal prefixes/suffixes),
    * the length gate |n-m| > k is a lower bound, and the banded DP
    * (Ukkonen '85: cells with |i-j| > k cannot lie on a <=k-cost path)
    * with row-min early abandon computes the rest. Cost per pair is
    * O((trimmed len)·k) with zero string copies — the fused form of
    * the when(substring...)/levenshtein(substring...) refine chain.
    */
  def levLe(a: UTF8String, b: UTF8String, k: Int): Int = {
    if (a.equals(b)) return 0
    val ca = codePoints(a)
    val cb = codePoints(b)
    var s = 0
    var ae = ca.length
    var be = cb.length
    while (s < ae && s < be && ca(s) == cb(s)) s += 1
    while (ae > s && be > s && ca(ae - 1) == cb(be - 1)) { ae -= 1; be -= 1 }
    val n = ae - s
    val m = be - s
    if (math.abs(n - m) > k) return -1
    if (n == 0) return m
    if (m == 0) return n
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      var rowMin = inf
      if (i <= k) { cur(0) = i; rowMin = i }
      var jj = math.max(1, i - k)
      val hi = math.min(m, i + k)
      while (jj <= hi) {
        val cost = if (ca(s + i - 1) == cb(s + jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        if (prev(jj) + 1 < v) v = prev(jj) + 1
        if (cur(jj - 1) + 1 < v) v = cur(jj - 1) + 1
        if (v > inf) v = inf
        cur(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      if (rowMin > k) return -1
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }
}

/** `graft_lev_le(a, b, k)` — threshold Levenshtein as ONE codegen'd
  * call per candidate pair. The composable refine chain
  * (`when(substring(a,1,9)=substring(b,1,9), levenshtein(substr,substr,k))
  * .otherwise(levenshtein(a,b,k))`) evaluates up to four substring
  * copies + two expression trees per pair; at 100 TB the refine stage
  * runs per CANDIDATE, so per-pair constant factors are the query's
  * cost. Returns the exact distance when <= k, -1 otherwise (same
  * contract as Spark's 3-arg levenshtein, so oracles are unchanged).
  */
case class LevenshteinLe(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
  require(k >= 0, s"k must be >= 0, got $k")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, string), got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_lev_le"

  override def nullSafeEval(a: Any, b: Any): Any =
    LevRuntime.levLe(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.LevRuntime.levLe($a, $b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevenshteinLe =
    copy(left = newLeft, right = newRight)
}

/** Ordered ratio-sum over a model map: Σᵢ map(bgs[i]), folded left to
  * right from 0.0 — bit-identical to
  * `aggregate(bgs, 0.0D, (acc, x) -> acc + element_at(mr, x))` and to
  * the oracle's `list_reduce` (same doubles, same IEEE add order) —
  * but each lookup is a hash-index get instead of Spark's GetMapValue
  * LINEAR SCAN over the map entries. The broadcast model map holds
  * every corpus bigram (~charset² entries), so the scan made
  * td_lm_surprisal's scoring fold O(doc_bigrams × model_size) — 9.2 s
  * warm at sf0.1 under the honest bench action; the index drops the
  * fold to O(doc_bigrams). The index is built once per distinct map
  * instance (reference-memoized: the broadcast model is one object per
  * executor, and a stale-reference miss merely rebuilds a ~charset²
  * HashMap). A missing or null-valued key yields null, exactly like
  * element_at + null-propagating `+`.
  */
case class MapRatioFold(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
  import org.apache.spark.sql.types.{ArrayType, DoubleType, MapType}

  override def inputTypes = Seq(ArrayType(StringType),
    MapType(StringType, DoubleType))
  override def dataType: DataType = DoubleType
  // a missing (or null-valued) key yields null whatever the children's
  // nullability — same reason GetMapValue hard-codes nullable=true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_map_ratio_fold"

  /** Identity of a map VALUE rather than its per-row wrapper:
    * UnsafeRow.getMap allocates a fresh UnsafeMapData wrapper on every
    * row even when all rows reference one broadcast value, so an
    * instance-`eq` memo would rebuild the index per row (and a
    * container that reuses one instance over re-pointed storage would
    * serve a stale index). The backing (baseObject, baseOffset, size)
    * triple identifies the actual bytes; non-Unsafe maps fall back to
    * instance identity. */
  private def mapIdentity(m: MapData): (AnyRef, Long, Long) = m match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeMapData =>
      val ka = u.keyArray()
      (ka.getBaseObject, ka.getBaseOffset, u.numElements().toLong)
    case other => (other, 0L, 0L)
  }

  /** Memoized index plus the content probe that validates it. The
    * identity triple alone is NOT sufficient for arbitrary per-row
    * maps (ADVICE r13): shuffle/sort readers and unsafe-row writers
    * recycle ONE backing byte array across rows, so a DIFFERENT map
    * with the same entry count can occupy the same (object, offset)
    * region and would be served a stale index. Before serving, the
    * memo therefore also re-checks BOTH backing arrays' total byte
    * sizes (keys AND values — a same-key-set map with sparse value
    * differences must disagree in at least one of value bytes or a
    * probed slot to be caught, and variable-width value regions make
    * the size check bite first) and byte-equality of up to
    * [[ProbePoints]] STRIDE-SAMPLED entries
    * (key bytes + value, null-aware, positions fixed per entry count:
    * boundaries plus evenly-spaced interior points) — O(1) per row.
    * The validation is PROBABILISTIC, not airtight (ADVICE r14): a
    * recycled-buffer per-row map with the same (object, offset,
    * count) identity, BOTH array byte sizes equal, and entries
    * matching at every probed position yet differing at an unprobed
    * interior slot is still served the stale index. For the intended
    * broadcast-constant model maps (one object per executor) the
    * probe always passes; for ordinary recycled-buffer per-row maps
    * a probe miss merely rebuilds — the correct GetMapValue-
    * equivalent behavior. Callers feeding genuinely PER-ROW maps
    * whose values vary sparsely within one fixed-width key set
    * should not route through this expression. (The airtight
    * alternative —
    * restricting the memo to foldable children — would drop it for
    * the one caller it exists for: td_lm_surprisal's model map
    * arrives via a broadcast join column, not a literal. Full-bytes
    * comparison per row would cost O(model) per document — the exact
    * scan the index removes.) A single immutable value so a racing
    * rebuild can never pair one map's identity with another's index;
    * assignment is atomic, worst case is a redundant rebuild. */
  private final class Memoized(
      val id: (AnyRef, Long, Long),
      val keyBytes: Long,
      val valBytes: Long,
      val probeKeys: Array[UTF8String],
      val probeVals: Array[java.lang.Double],
      val idx: java.util.HashMap[UTF8String, java.lang.Double])

  @transient private var cache: Memoized = _

  /** Probe-sample width: boundaries + 6 interior points. */
  private val ProbePoints = 8

  /** Deterministic probe positions for an n-entry map: 0, n-1, and
    * evenly-strided interior points, deduplicated ascending — a pure
    * function of n, so builder and checker always sample the same
    * slots. */
  private def probePositions(n: Int): Array[Int] =
    if (n <= ProbePoints) Array.range(0, n)
    else Array.tabulate(ProbePoints)(i =>
      ((n - 1).toLong * i / (ProbePoints - 1)).toInt).distinct

  private def unsafeBytes(
      a: org.apache.spark.sql.catalyst.util.ArrayData): Long = a match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
      u.getSizeInBytes.toLong
    case _ => 0L
  }

  private def keySize(m: MapData): Long = unsafeBytes(m.keyArray())

  private def valSize(m: MapData): Long = unsafeBytes(m.valueArray())

  private def valAt(m: MapData, i: Int): java.lang.Double =
    if (m.valueArray().isNullAt(i)) null
    else java.lang.Double.valueOf(m.valueArray().getDouble(i))

  private def probeMatches(c: Memoized, m: MapData, pos: Array[Int]): Boolean = {
    var i = 0
    while (i < pos.length) {
      if (!c.probeKeys(i).equals(m.keyArray().getUTF8String(pos(i))) ||
        !java.util.Objects.equals(c.probeVals(i), valAt(m, pos(i))))
        return false
      i += 1
    }
    true
  }

  private def index(m: MapData)
      : java.util.HashMap[UTF8String, java.lang.Double] = {
    val id = mapIdentity(m)
    val c = cache
    val n = m.numElements()
    val pos = probePositions(n)
    if (c != null && (c.id._1 eq id._1) && c.id._2 == id._2 &&
      c.id._3 == id._3 && c.keyBytes == keySize(m) &&
      c.valBytes == valSize(m) &&
      c.probeKeys.length == pos.length && probeMatches(c, m, pos))
      return c.idx
    val idx = new java.util.HashMap[UTF8String, java.lang.Double](n * 2)
    val ks = m.keyArray()
    val vs = m.valueArray()
    var i = 0
    while (i < n) {
      // clone: Unsafe-backed keys can point into a shared buffer.
      // First-wins on duplicate keys — GetMapValue's linear scan
      // returns the first match — via containsKey (putIfAbsent would
      // overwrite an existing NULL-valued first mapping).
      val k = ks.getUTF8String(i)
      if (!idx.containsKey(k)) {
        val v: java.lang.Double = if (vs.isNullAt(i)) null
          else java.lang.Double.valueOf(vs.getDouble(i))
        idx.put(k.clone(), v)
      }
      i += 1
    }
    // probe fields cloned off the (possibly shared) buffer
    cache = new Memoized(id, keySize(m), valSize(m),
      pos.map(p => ks.getUTF8String(p).clone()),
      pos.map(p => valAt(m, p)),
      idx)
    idx
  }

  override def nullSafeEval(bgsAny: Any, mapAny: Any): Any = {
    val bgs = bgsAny.asInstanceOf[ArrayData]
    val idx = index(mapAny.asInstanceOf[MapData])
    val n = bgs.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      val v = idx.get(bgs.getUTF8String(i))
      if (v == null) return null
      sum += v.doubleValue()
      i += 1
    }
    sum
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
