package graft.operators

import java.nio.file.{Files, Path, Paths}

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Spec-level gate for the memoization PRINCIPLE stated in BASELINE.md
  * and judged in VERDICT r10: memoize derived ARTIFACTS (trained
  * models, cluster labels — things a production pipeline persists as
  * tables between stages), NEVER operator execution itself. PageRank /
  * LabelPropagation / ConnectedComponents warm runs must keep
  * measuring the iterative operator honestly; a fingerprint-keyed memo
  * of their output would turn every benchmark warm number into an
  * artifact-cache read (VERDICT r10 top-next #6 asked for exactly this
  * gate as code, not prose).
  *
  * Two layers:
  *   1. structural — no file under `operators/` may touch the
  *      fingerprint-memo machinery (`Tables.pathFingerprint` /
  *      `Memo.memoized` / `Tables.pathFingerprint`): operators are
  *      pure computation, memo policy lives in the query/artifact
  *      layer (`Memo.getOrBuild` — the built-FRAME memo with no
  *      fingerprint and no execution-result caching — stays allowed);
  *   2. behavioral — a REPEATED PageRank run on identical input must
  *      re-execute the iterative loop (≥ one Spark job per iteration),
  *      not return in O(1) jobs from some cache keyed outside the
  *      plan.
  */
class MemoPrincipleSpec extends AnyFunSuite with SparkTestSession {

  test("operators/ never references the fingerprint-memo machinery") {
    val dir = Paths.get("src/main/scala/graft/operators")
    assert(Files.isDirectory(dir), s"expected $dir from the repo root")
    import scala.jdk.CollectionConverters._
    val offenders = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filter { p: Path =>
        val src = new String(Files.readAllBytes(p), "UTF-8")
        src.contains("pathFingerprint") || src.contains("Memo.memoized")
      }
      .map(_.getFileName.toString).toSeq
    assert(offenders.isEmpty,
      s"iterative/operator code must not memoize by corpus fingerprint " +
        s"(memo policy belongs to the artifact layer): $offenders")
  }

  test("a repeated PageRank run re-executes the iterative loop") {
    import spark.implicits._
    val edges = (for { s <- 1L to 40L; d <- 1L to 40L
      if (s * 7 + d) % 5 == 0 && s != d } yield (s, d)).toDF("src", "dst")
    val iterations = 6
    // each run under its OWN job group: suites share one SparkContext
    // and may run in parallel, so a global job-id delta is racy — the
    // group-scoped job list counts exactly this run's jobs
    def runOnce(tag: String): Long = {
      val group = s"memo-principle-$tag"
      spark.sparkContext.setJobGroup(group, "MemoPrincipleSpec")
      try {
        PageRank.run(edges, iterations, srcCol = "src", dstCol = "dst")
          .collect()
        spark.sparkContext.statusTracker.getJobIdsForGroup(group).length.toLong
      } finally spark.sparkContext.clearJobGroup()
    }
    val first = runOnce("first")
    val second = runOnce("second")
    assert(first >= iterations,
      s"fixture broken: first run should schedule >= $iterations jobs, got $first")
    assert(second >= iterations,
      s"warm PageRank scheduled only $second job(s) — its execution has " +
        "been memoized; only derived artifacts may be memoized")
  }
}
