package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins LabelPropagation.run's synchronous-LPA semantics on graphs
  * small enough to hand-compute: mode of neighbour labels, ties to the
  * SMALLEST label, multigraph edge weighting, no-out-edge nodes keep
  * their label, synchronous (not in-place) updates. These are the
  * invariants the rel_graph_labelprop oracle replays — a drift here
  * would surface as a cross-engine hash mismatch.
  */
class LabelPropagationSpec extends AnyFunSuite with SparkTestSession {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def undirected(pairs: (Long, Long)*) =
    edges(pairs ++ pairs.map(_.swap): _*)

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("zero iterations: every node is its own community") {
    val out = labelsOf(LabelPropagation.run(undirected(1L -> 2L), 0))
    assert(out == Map(1L -> 1L, 2L -> 2L))
  }

  test("ties break to the smallest neighbour label") {
    // node 3 sees labels {1, 2} once each → adopts 1; nodes 1 and 2
    // see only {3} → adopt 3
    val g = undirected(1L -> 3L, 2L -> 3L)
    val out = labelsOf(LabelPropagation.run(g, 1))
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 1L))
  }

  test("duplicate edges weight the neighbour's label (multigraph)") {
    // node 3 sees label 2 twice vs label 1 once → majority wins over
    // the smaller label
    val g = undirected(1L -> 3L, 2L -> 3L, 2L -> 3L)
    val out = labelsOf(LabelPropagation.run(g, 1))
    assert(out(3L) == 2L)
  }

  test("a node with no out-edges keeps its label") {
    // directed 1 -> 2 only: node 2 never adopts, node 1 adopts 2
    val out = labelsOf(LabelPropagation.run(edges(1L -> 2L), 2))
    assert(out == Map(1L -> 2L, 2L -> 2L))
  }

  test("updates are synchronous: round k reads only round k-1 labels") {
    // path 1 - 2 - 3. Sync round 1: 1→2, 2→1 (tie {1,3} → 1), 3→2.
    // An in-place sweep would instead let 3 read 2's ALREADY-updated
    // label 1 and converge differently.
    val g = undirected(1L -> 2L, 2L -> 3L)
    val out = labelsOf(LabelPropagation.run(g, 1))
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("12 iterations complete in bounded time (per-round checkpoint)") {
    // Each LPA update references the previous label table twice, so
    // without the per-round localCheckpoint the logical plan doubles
    // every round — 2^12 subtrees here — and the driver spends minutes
    // in analysis alone. With the checkpoint, 12 rounds on a 60-node
    // ring are a dozen O(nodes) jobs; assert it stays interactive.
    val ring = undirected((0L until 60L).map(i => i -> ((i + 1) % 60)): _*)
    val start = System.nanoTime()
    val out = labelsOf(LabelPropagation.run(ring, 12))
    val secs = (System.nanoTime() - start) / 1e9
    assert(out.size == 60)
    assert(secs < 120.0, s"12 LPA rounds took ${secs}s — plan growth?")
  }

  test("disjoint cliques converge to their own min-id communities") {
    val k3a = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)
    val k3b = Seq(10L -> 11L, 11L -> 12L, 10L -> 12L)
    val out = labelsOf(LabelPropagation.run(undirected(k3a ++ k3b: _*), 4))
    // within each triangle every node sees the other two; two rounds
    // in, the smallest id dominates and the assignment is stable
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(Set(out(10L), out(11L), out(12L)).size == 1)
    assert(out(1L) != out(10L))
  }
}
