package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the DATA-LAYOUT operator a 100 TB
  * lake needs for multi-column scan pruning. Sorting files by one
  * column gives parquet row-group/file min-max pruning on that column
  * only; interleaving the bits of two columns into one z-value and
  * range-partitioning + sorting on it bounds EVERY file to a small
  * rectangle of the (a, b) plane, so predicates on either column (or
  * both) skip most files from footer statistics alone. This is the
  * same layout primitive Delta/Iceberg expose as `OPTIMIZE ZORDER BY`,
  * built here from stock Spark pieces: a codegen-friendly bit-spread
  * expression (shifts/masks only — whole-stage codegen keeps it in the
  * scan projection), `repartitionByRange` (range exchange with
  * sampled bounds) and `sortWithinPartitions`.
  *
  * The z-value math (16-bit magic-number spread) is pure integer
  * arithmetic, mirrored exactly by the DuckDB oracle of
  * rel_zorder_cluster; ZOrderSpec proves the pruning effect on real
  * parquet footers (files intersecting a b-predicate under z-layout
  * vs a-sorted layout).
  */
object ZOrder {

  /** Interleave the low 16 bits of `x` into even bit positions
    * (Morton spread): x | x<<8 … masked — 4 shift/mask rounds, all
    * codegen'd builtins, no UDF. Input must be in [0, 65535]. */
  def spread16(x: Column): Column = {
    val m1 = lit(0x00FF00FFL)
    val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L)
    val m4 = lit(0x55555555L)
    val s1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(m1)
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(m2)
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(m3)
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(m4)
  }

  /** 32-bit Morton code of two 16-bit values: a in even bits, b odd. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Min-max-normalize a non-negative dimension to [0, 65535]. Both
    * dimensions MUST be normalized to the full 16 bits before
    * interleaving: if one dim's domain uses more significant bits than
    * the other's, its high bits dominate the z-order and the layout
    * degenerates to a single-column sort (each file then spans the
    * whole other dimension — no pruning). `maxVal` is the dimension's
    * observed maximum (one cheap agg).
    *
    * The multiply is widened through decimal(38,0): `c * 65536` in
    * Long arithmetic silently wraps for values above ~2^47, corrupting
    * the z-order with no error. Decimal keeps the product exact over
    * the full Long domain; this runs once per row at LAYOUT time (not
    * in a scan hot path), so the decimal cost is irrelevant. For
    * `0 <= c <= maxVal` the floored quotient is provably in
    * [0, 65535], satisfying [[spread16]]'s precondition. */
  def normalize16(c: Column, maxVal: Long): Column = {
    require(maxVal >= 0 && maxVal < Long.MaxValue,
      s"maxVal must be in [0, ${Long.MaxValue - 1}], got $maxVal")
    // exact floor-div: decimal DIVISION rounds at its result scale
    // (65535.999… would round UP to 65536), but decimal `%` is exact,
    // so divide only after subtracting the remainder — the quotient is
    // then integral and rounding is the identity
    val a = c.cast("decimal(38,0)") * lit(65536L)
    val b = lit(maxVal + 1L).cast("decimal(38,0)")
    ((a - a % b) / b).cast("long")
  }

  /** Cluster `df` for (a, b) pruning: compute the z-value of the two
    * 16-bit-normalized dimensions, range-partition on it into
    * `numFiles` buckets (range exchange: each output file covers one
    * contiguous z-interval ⇒ one small (a, b) rectangle) and sort
    * within partitions so row groups inside a file are tight too.
    * Returns the frame with its `zval` column; callers write it out
    * with the layout preserved.
    *
    * Inputs are masked to [[spread16]]'s [0, 65535] domain with `pmod`
    * (identity for already-normalized inputs, two codegen'd ops): an
    * out-of-range dimension would otherwise corrupt the interleave
    * silently. Callers should still [[normalize16]] first — a raw
    * modulus wraps rather than scales, which scrambles locality even
    * though the z-math stays well-defined. */
  def cluster(df: DataFrame, a: Column, b: Column,
      numFiles: Int): DataFrame =
    df.withColumn("zval",
        zValue(pmod(a, lit(65536L)), pmod(b, lit(65536L))))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
}
