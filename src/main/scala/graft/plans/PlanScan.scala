package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Executed-plan introspection shared by the bench tools and the specs
  * (review r16: this lived in a CLI tool that a spec reached into). */
object PlanScan {

  /** FileSourceScanExec nodes of an executed (possibly adaptive) plan,
    * descending through AQE wrappers and query stages. */
  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: QueryStageExec => fileScans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(fileScans)
  }
}
