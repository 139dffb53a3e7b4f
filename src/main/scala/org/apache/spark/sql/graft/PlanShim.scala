package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal bridge into the `private[sql]` plan-construction API — the
  * standard pattern for libraries that add custom logical operators
  * (a DataFrame can only be built from a LogicalPlan via
  * `Dataset.ofRows`, and Spark 4 Columns only expose their Expression
  * through `classic.ExpressionUtils`). Nothing else from the internal
  * surface is used.
  */
object PlanShim {

  /** Eagerly convert a Column's node tree to a catalyst Expression
    * (UnresolvedAttributes intact — the analyzer resolves them inside
    * the receiving logical node). The lazy `ExpressionUtils.expression`
    * wrapper must NOT be used here: it reports resolved=true and then
    * fails at execution. */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The frame's analyzed plan AFTER cache-manager substitution — the
    * exact tree `optimizedPlan` would optimize, exposed separately so
    * graft.plans.DeferredBuild can key its optimized-plan memo on the
    * live cache state (same QueryExecution, so a following
    * [[optimizedPlan]] call shares the substitution work). */
  def withCachedData(df: DataFrame): LogicalPlan =
    df.queryExecution.withCachedData

  def optimizedPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.optimizedPlan

  /** Identity handles of every InMemoryRelation cache builder in
    * `plan` — one distinct object per live cache entry, fresh after
    * any unpersist + re-persist cycle, which is exactly the epoch
    * signal DeferredBuild's memo key needs. */
  def cacheBuilders(plan: LogicalPlan): Seq[AnyRef] = plan.collect {
    case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
      r.cacheBuilder
  }
}
