package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the cluster-resolution step of the dedup pipeline
  * (graft.queries.DedupQueries; SURVEY.md §7.1 step 9).
  *
  * Default algorithm: alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14). Each round is two groupBy+join passes over the edge set —
  * no driver-side graph state — and the round count is O(log d) in the
  * component diameter d, versus O(d) for plain min-label propagation.
  * Every iteration `localCheckpoint`s (lazily) so lineage stays flat and
  * executor loss never recomputes the whole chain, and convergence costs
  * exactly one action per round (the checkpoint materializes inside the
  * checksum job).
  *
  * Both operations only ever connect nodes to smaller ids within their
  * component, so the fixpoint is a forest of stars centered at each
  * component's minimum id — the same labeling min-label propagation
  * produces (pinned by ConnectedComponentsSpec against
  * [[labelPropagation]] and by the driver's recursive-CTE DuckDB oracle).
  */
object ConnectedComponents {

  /** (id, label = component-minimum id) for every node incident to an
    * edge. Input edges are undirected; self-loops and duplicates are
    * tolerated.
    */
  def labels(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxIterations: Int = 64): DataFrame = {
    // canonical directed form: u -> v with u > v; checkpointed so the
    // (possibly expensive) edge-producing pipeline runs exactly once
    var e = edges
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)

    // nodes incident to a real (non-self-loop) edge, from the
    // checkpointed set — never recomputes the input pipeline
    val nodes = e.select(col("u").as("id"))
      .unionByName(e.select(col("v").as("id")))
      .distinct()

    var prev: Option[(Long, Long)] = None
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      // lazy checkpoint: the checksum action below materializes it, so
      // each round is ONE job and next round starts from stored blocks.
      // Superseded rounds' blocks are freed by the ContextCleaner once
      // unreferenced (localCheckpoint has no deterministic unpersist);
      // acceptable because rounds are O(log diameter) — bounded by
      // maxIterations — and the edge set shrinks as stars collapse.
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val row = next.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L))).head()
      val sig = (row.getLong(0), row.getLong(1))
      converged = prev.contains(sig)
      prev = Some(sig)
      e = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIterations rounds")

    // fixpoint is a star forest: every non-center u has exactly one
    // neighbor — its component min; centers never appear as u
    val lbl = e.groupBy(col("u")).agg(min(col("v")).as("label"))
      .select(col("u").as("id"), col("label"))
    nodes.join(lbl, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  /** Large-star: for every node u, connect each strictly-larger neighbor
    * to min(Γ(u) ∪ {u}). Output edges stay canonical (left > right)
    * because the emitted target is a minimum.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.select(col("u"), col("v"))
      .unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("m"))
    nbrs.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: for every node u over its smaller neighbors S (the
    * canonical out-neighborhood), connect S ∪ {u} minus the minimum m
    * to m.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
    val reattached = e.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v")) // v > m: m is S's min
    val center = mins.select(col("u"), col("m").as("v")) // u > m always
    reattached.unionByName(center).distinct()
  }

  /** Reference implementation: deterministic min-label propagation to an
    * exact fixpoint (labels only decrease, so the label sum is a strictly
    * decreasing witness). O(diameter) rounds with 2 jobs each — kept as
    * the cross-check for [[labels]], not the production path.
    */
  private[graft] def labelPropagation(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val bi = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(
        edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint(false)
    var labels = bi.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(false)
    var prevSum = labels.agg(coalesce(sum(col("label")), lit(0L)))
      .head.getLong(0)
    var converged = false
    while (!converged) {
      val msgs = bi.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.unionByName(msgs)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val after = next.agg(coalesce(sum(col("label")), lit(0L)))
        .head.getLong(0)
      labels = next
      converged = after == prevSum
      prevSum = after
    }
    labels
  }
}
