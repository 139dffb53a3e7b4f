package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point for cluster deployments:
  * `--conf spark.sql.extensions=graft.GraftExtensions` makes the engine's
  * custom expressions available as SQL functions in every session.
  * (Local/embedded callers can equivalently use GraftFunctions.register.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.BucketAdmitJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankingFilterToTopK)
    ext.injectOptimizerRule(_ => graft.plans.RewriteDeferredBuild)
  }
}
