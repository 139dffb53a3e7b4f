package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
