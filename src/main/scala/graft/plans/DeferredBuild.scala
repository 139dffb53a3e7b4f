package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule

/** A resolved leaf whose child plan is BUILT ON DEMAND — the deferral
  * vehicle for operators whose plan SHAPE depends on driver-side
  * sizing actions (Butterfly's adaptive attribution: degree-broadcast
  * and priority-encoding decisions, the dominated-edge bound, the
  * exact pair-count probe). Returning such an operator eagerly forced
  * those jobs — and up to ~800 MB of cache registration — on callers
  * merely COMPOSING plans (VERDICT r11 #5); behind this leaf, plan
  * composition is free and the sizing work runs exactly when Catalyst
  * first optimizes the query, i.e. when an action (or explain) demands
  * a physical plan.
  *
  * The leaf is analyzer-complete on its own: `output` declares the
  * result attributes (fixed schema, everything nullable), so downstream
  * operators resolve against it like any table. [[RewriteDeferredBuild]]
  * later splices the real child in under those exact exprIds.
  *
  * `build` must return an OPTIMIZED plan producing the declared column
  * count and dataTypes (nullability may be stricter), and must memoize
  * its EXPENSIVE work (driver-side sizing actions, cache
  * registrations) — optimization can run more than once per query (one
  * QueryExecution per action, each cloning the logical plan), and the
  * clone shares only the closure, not any node-level state. Do NOT
  * memoize the optimized plan itself: optimization bakes in cache
  * substitution, so a frozen plan would pin the first action's cache
  * state (stale InMemoryRelations after an unpersist). Memoize the
  * logical plan / DataFrame and derive a fresh QueryExecution per call
  * — driver-side only, no jobs (see Butterfly.deferred).
  */
case class DeferredBuild(output: Seq[Attribute], label: String,
    build: () => LogicalPlan) extends LeafNode {
  // size unknown until built: report effectively-infinite so no
  // stats-driven decision (auto-broadcast, join reorder) gambles on a
  // result that has not been sized yet — an explicit broadcast() hint
  // on the returned frame still wins, as hints override stats
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(Long.MaxValue))
}

/** Optimizer rule (registered with [[RewriteRankingFilterToTopK]] via
  * `spark.experimental.extraOptimizations` / GraftExtensions): replace
  * each [[DeferredBuild]] leaf with its built child, aliased
  * position-by-position onto the leaf's declared exprIds so every
  * downstream reference stays bound. Runs inside the optimizer — the
  * first phase Spark evaluates lazily — so this is the moment "an
  * action demands the plan"; `build()` runs its sizing jobs here and
  * the spliced-in result is an ordinary optimized subtree (AQE,
  * whole-stage codegen, and cached-plan substitution all see normal
  * operators, never the leaf). */
object RewriteDeferredBuild extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case d: DeferredBuild =>
      val inner = d.build()
      require(inner.output.length == d.output.length &&
        inner.output.zip(d.output).forall { case (i, o) =>
          i.dataType == o.dataType },
        s"DeferredBuild(${d.label}): built plan " +
          s"${inner.output.map(a => s"${a.name}:${a.dataType.simpleString}")} " +
          s"does not match the declared output " +
          s"${d.output.map(a => s"${a.name}:${a.dataType.simpleString}")}")
      Project(d.output.zip(inner.output).map { case (o, i) =>
        Alias(i, o.name)(exprId = o.exprId) }, inner)
  }
}
