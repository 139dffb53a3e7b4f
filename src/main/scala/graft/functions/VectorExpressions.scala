package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * This is the hot-path kernel of the similarity/dedup layer (SURVEY.md §7.1
  * step 9): an O(pairs × dim) inner loop that must stay inside generated Java,
  * not an interpreted higher-order function and not a boxing Scala UDF.
  *
  * Summation order is a fixed ascending-index left fold (acc starts at 0.0),
  * so the result is IEEE-deterministic and bit-identical to any engine that
  * folds the element products left-to-right — the DuckDB oracles replay
  * exactly that shape with `list_reduce`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  /** Mismatched lengths yield null, never a silently-truncated sum — a
    * corrupt-dimension vector must not produce a plausible score. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int ${ev.value}_n = $a.numElements();
         |if (${ev.value}_n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double ${ev.value}_acc = 0.0;
         |  for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |    ${ev.value}_acc += $a.getDouble(${ev.value}_i) * $b.getDouble(${ev.value}_i);
         |  }
         |  ${ev.value} = ${ev.value}_acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared-L2 distance on ONE subspace of two `array<double>`
  * columns: Σ_{i=0}^{subDim−1} (a[s·subDim+i] − b[s·subDim+i])².
  *
  * This is the product-quantization hot kernel (the ADC distance-table
  * build and the encode step both evaluate it candidates × codes times,
  * VERDICT r8 #4): as a `aggregate(transform(sequence(...)))` chain it
  * runs as interpreted higher-order functions — per-row lambda dispatch
  * and a materialized 16-element array — where this expression is a
  * fused generated-Java loop inside whole-stage codegen.
  *
  * Summation is the same ascending-index left fold from 0.0 as
  * [[DotProduct]], bit-identical to the DuckDB oracle's `list_reduce`
  * over the same window. A subspace that overruns either array yields
  * null (matching `element_at`'s out-of-range null under the pinned
  * non-ANSI dialect, and keeping a corrupt-dimension vector from
  * scoring plausibly).
  */
case class SubspaceL2(first: Expression, second: Expression,
    third: Expression, subDim: Int)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_subspace_l2"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any, s: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // bounds math in LONG: int `s * subDim` can wrap, and a wrapped
    // base + subDim can overflow negative so the `>` guard passes while
    // the index is out of bounds — registered as a general SQL function,
    // s is arbitrary caller input, not just the PQ query's 0..3
    val base = s.asInstanceOf[Int].toLong * subDim
    if (base < 0 || base + subDim > x.numElements()
        || base + subDim > y.numElements()) return null
    val b0 = base.toInt // < numElements <= Int.MaxValue after the guard
    var acc = 0.0
    var i = 0
    while (i < subDim) {
      val d = x.getDouble(b0 + i) - y.getDouble(b0 + i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, s) => {
      val base = ctx.freshName("base")
      val baseI = ctx.freshName("baseI")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      // same long-math guard as nullSafeEval: int s*subDim can wrap.
      // NOTE the operator placement: a generated line must never START
      // with '|' — enclosing whole-stage templates run stripMargin over
      // the combined source, which eats leading pipes and turned a
      // leading "||" into invalid Java. The whole PQ/ADC kernel then
      // silently fell back to INTERPRETED execution for every
      // candidate row ("Failed to compile ... ')' expected instead of
      // 'base_0'" in the sweep logs, r8-r12); CodegenProbe pins the
      // clean compile now.
      s"""
         |long $base = (long) $s * $subDim;
         |if ($base < 0 || $base + $subDim > $a.numElements() ||
         |    $base + $subDim > $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $baseI = (int) $base;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $subDim; $i++) {
         |    double $d = $a.getDouble($baseI + $i) - $b.getDouble($baseI + $i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
