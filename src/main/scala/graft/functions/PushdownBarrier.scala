package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that reports itself non-deterministic, pinning the
  * enclosing predicate where the user wrote it.
  *
  * Catalyst only moves deterministic expressions: a Filter whose
  * condition contains this node is never pushed below an aggregate,
  * join, or project. A plain `rand()`-based guard is NOT enough — the
  * optimizer constant-folds provably-constant rand comparisons (e.g.
  * `rand() > 2` → false on Spark 4.1) and then moves the remaining
  * predicate; no rule can reason about this opaque expression. Runtime
  * cost is zero: eval and codegen delegate to the child unchanged.
  *
  * Used by [[GraftFunctions.noPushdown]] to make filters on merged
  * session-window bounds sound (see SessionWindowPushdownSpec).
  */
case class PushdownBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override def prettyName: String = "graft_barrier"
  override protected def withNewChildInternal(newChild: Expression): PushdownBarrier =
    copy(child = newChild)
}
