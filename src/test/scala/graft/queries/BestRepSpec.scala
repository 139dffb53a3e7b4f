package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of td_dedup_best_rep (round 15): the
  * quality-weighted cluster representative. Value-level exactness is
  * the DuckDB oracle's job; these pin the argmax discipline and the
  * composition contract with the shared cluster labels.
  */
class BestRepSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.01"

  private def run(name: String) =
    SparkEntry.registry(name).build(spark, sfDir)

  test("exactly one representative per cluster, and it is the argmax") {
    val rows = run("td_dedup_best_rep").collect()
    assert(rows.nonEmpty, "sf0.01 fixture has dup clusters")
    rows.groupBy(_.getAs[Long]("component_id")).foreach { case (c, rs) =>
      val reps = rs.filter(_.getAs[Boolean]("is_rep"))
      assert(reps.length == 1, s"component $c must have exactly one rep")
      val rep = reps.head
      // the rep strictly dominates every other member under
      // (quality DESC, doc_id ASC)
      rs.filterNot(_.getAs[Boolean]("is_rep")).foreach { m =>
        val better = m.getAs[Double]("quality_score") >
          rep.getAs[Double]("quality_score") ||
          (m.getAs[Double]("quality_score") ==
            rep.getAs[Double]("quality_score") &&
            m.getAs[Long]("doc_id") < rep.getAs[Long]("doc_id"))
        assert(!better, s"member $m beats rep $rep in component $c")
      }
    }
  }

  test("membership and labels agree with td_dedup_clusters") {
    val best = run("td_dedup_best_rep")
      .select(col("doc_id"), col("component_id"))
    val clusters = run("td_dedup_clusters")
      .select(col("doc_id"), col("component_id"))
    assert(best.exceptAll(clusters).isEmpty &&
      clusters.exceptAll(best).isEmpty,
      "best-rep rows must be exactly the clustered docs")
  }
}
