package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sketch kernels for near-duplicate detection. Both take a pre-hashed
  * `array<long>` token column (the hashing itself — md5-hex → 60-bit long —
  * is built from codegen'd Spark built-ins in [[GraftFunctions]]) and run a
  * tight JVM loop per row. CodegenFallback is fine here: these run once per
  * document, not once per candidate pair, so per-row dispatch overhead is
  * negligible while the O(tokens × k) inner loop stays in compiled Java.
  *
  * All arithmetic is exact 64-bit integer math, replayed verbatim by the
  * DuckDB oracle SQL (same permutation constants, same modulus).
  */
object Sketches {
  /** Modulus for minhash permutations; hashes are reduced mod P upstream. */
  val P: Long = 1000000007L
}

/** k-permutation MinHash signature over an `array<long>` of shingle hashes
  * (each already in [0, P)). Permutation j is h → ((2j+3)·h + (5j+7)) mod P.
  * Returns `array<long>` of length k; null if the input array is empty
  * (callers filter docs with too few tokens first).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = 2L * j + 3
      val b = 5L * j + 7
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * hs.getLong(i) + b) % Sketches.P
        if (v < best) best = v
        i += 1
      }
      sig(j) = best
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash over an `array<long>` of token hashes: for each of `bits` low
  * bits, sum ±1 votes across tokens (frequency-weighted — duplicates count)
  * and set the output bit when the vote sum is strictly positive. Returns a
  * long; null for an empty token array.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(bits > 0 && bits <= 60, "bits must be in (0, 60]")

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val votes = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        votes(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass overlapping character n-grams over code points. The
  * composable form `transform(sequence(0, length(s)-n), i ->
  * substr(s, i+1, n))` is O(L²): every substr() call locates its
  * character offset by scanning the string from the start, which
  * dominates the LM-surprisal query on kilobyte documents. This kernel
  * walks the UTF-8 byte sequence ONCE, recording each code point's byte
  * offset, then slices every n-gram by byte range — O(L) total.
  * Bit-compatible with the composable form and with DuckDB's
  * `list_transform(range(length(s)-n+1), i -> substr(s, i+1, n))` for
  * strings of >= n characters (CharNGramsSpec pins the parity); shorter
  * strings yield an empty array — callers filter those out first, as
  * the two engines' range/sequence edge behaviors differ below n.
  */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(n >= 1, "n must be >= 1")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val nb = bytes.length
    // code-point start offsets + end sentinel (worst case: all 1-byte)
    val offs = new Array[Int](nb + 1)
    var i = 0
    var c = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(c) = nb
    if (c < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](c - n + 1)
    var k = 0
    while (k <= c - n) {
      out(k) = UTF8String.fromBytes(bytes, offs(k), offs(k + n) - offs(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused shingle + hash kernel: word array → k-shingle strings (joined
  * with single spaces) → 60-bit md5-prefix hash each, optionally reduced
  * mod P — one tight JVM loop per row instead of a chain of interpreted
  * higher-order functions (transform/concat_ws/md5/conv per element).
  *
  * Bit-compatible with the composable form
  * `transform(shingles(ws,k), s -> hash60(s))` and with the DuckDB oracle
  * `list_transform(range(len(ws)-k+1), i -> CAST('0x'||substr(md5(...),1,15)
  * AS BIGINT))`: the 60-bit value is exactly the first 15 hex digits of
  * the md5 of the shingle's UTF-8 bytes. k=1 yields per-word hashes (the
  * SimHash input).
  */
case class ShingleHash60(child: Expression, k: Int, modP: Boolean)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k >= 1, "k must be >= 1")

  override def inputTypes = Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash"

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    val space = Array[Byte](' ')
    var i = 0
    while (i <= n - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(space)
        md.update(ws.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      // first 15 hex digits = bytes 0..6 + the high nibble of byte 7
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = (v << 4) | ((d(7) >> 4) & 0xfL)
      out(i) = if (modP) v % Sketches.P else v
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
