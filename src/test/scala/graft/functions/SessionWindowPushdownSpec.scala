package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter => LFilter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the session-window predicate-pushdown hazard and the engine's
  * mitigation ([[GraftFunctions.noPushdown]] / [[PushdownBarrier]]).
  *
  * Filtering the OUTPUT of a `session_window` aggregation on the merged
  * window bounds looks innocent, but Catalyst pushes deterministic
  * predicates on grouping expressions below the aggregate — and for
  * session windows the "grouping expression" before merging is each
  * row's initial `[ts, ts+gap)` window. The pushed predicate then drops
  * rows whose initial window fails it BEFORE session merging, which can
  * fabricate shorter sessions the unfiltered aggregation never produces
  * (a session splits exactly when one of its extension events is
  * filtered away). Observed on Spark 4.1.2 with the driver fixture: the
  * bare-filtered session set contains a 5-event session that is a
  * truncation of a real 6-event one. A rand()-guard is NOT a fix — the
  * optimizer folds `rand() > 2` to false and pushes what remains.
  */
class SessionWindowPushdownSpec extends AnyFunSuite with SparkTestSession {

  private def sessions = {
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("ts"))
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
  }

  private def mx = Tables.load(spark, "/root/testdata/sf0.001", "events")
    .agg(max(col("ts"))).head().getTimestamp(0)

  /** Filters beneath the plan's Aggregate vs above it. */
  private def split(df: org.apache.spark.sql.DataFrame) = {
    val plan = df.queryExecution.optimizedPlan
    val agg = plan.collectFirst { case a: Aggregate => a }.get
    val below = agg.collect { case f: LFilter => f }
    val above = plan.collect { case f: LFilter => f }.filterNot(below.contains)
    (below, above)
  }

  test("noPushdown keeps a session-end filter above the session merge") {
    val lim = mx
    val guarded = sessions.filter(
      GraftFunctions.noPushdown(col("session_end") <= lit(lim)))
    val (below, above) = split(guarded)
    assert(above.exists(_.condition.toString.contains("graft_barrier")),
      s"barrier filter not above the aggregate: $above")
    assert(!below.exists(_.condition.toString.contains("6 hours")),
      s"session predicate still pushed below the merge: $below")

    // and the guarded result equals filtering the MATERIALIZED session
    // set — the unambiguous ground truth
    val truth = sessions.collect().toSeq
      .filter(r => !r.getTimestamp(2).after(lim)).toSet
    assert(guarded.collect().toSet == truth)
    assert(truth.nonEmpty)
  }

  test("the hazard is real: a bare filter pushes below the merge") {
    // documents WHY noPushdown exists; if a future Spark stops pushing
    // the predicate, this flags the mitigation as removable rather than
    // letting its rationale silently rot
    val bare = sessions.filter(col("session_end") <= lit(mx))
    val (below, _) = split(bare)
    assert(below.exists(_.condition.toString.contains("6 hours")),
      "Spark no longer pushes session-window predicates below the merge; " +
        "noPushdown may be droppable for this case")
  }

  test("bare filter fabricates sessions on the fixture (the observable bug)") {
    val lim = mx
    val truth = sessions.collect().toSeq
      .filter(r => !r.getTimestamp(2).after(lim)).toSet
    val bare = sessions.filter(col("session_end") <= lit(lim)).collect().toSet
    assert(bare != truth,
      "bare filter now matches ground truth on the fixture — recheck " +
        "whether the pushdown hazard still exists")
    // the fabricated rows are truncations: same (user, start), earlier end
    val extras = bare -- truth
    assert(extras.nonEmpty && extras.forall { e =>
      sessions.collect().exists(r => r.getLong(0) == e.getLong(0) &&
        r.getTimestamp(1) == e.getTimestamp(1) &&
        r.getTimestamp(2).after(e.getTimestamp(2)))
    }, s"unexpected divergence shape: $extras")
  }
}
