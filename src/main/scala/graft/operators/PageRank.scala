package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank over a directed edge list, in exact fixed-point
  * integer arithmetic ("token passing"): every node starts with
  * `initTokens`, each iteration sends `floor(tokens / out_degree)` along
  * every out-edge, and refreshes to
  * `resetTokens + floor(dampNum * received / dampDen)`.
  *
  * Why integer tokens instead of the textbook double ranks: the engine's
  * correctness gate hash-compares results cross-engine, and a double
  * PageRank is NOT reproducible — float addition is non-associative, so
  * the per-node sum of contributions depends on partition count and
  * reduce order (see the determinism notes in RelationalQueries). Long
  * addition is associative, so token PageRank is bit-identical across
  * engines, cluster sizes, and AQE re-plans, while ranking nodes in the
  * same order as the float variant up to the 1e-6 quantization. Headroom:
  * total tokens ≈ nodes·initTokens·dampNum grows to ~8.5e16 at 1e9 nodes
  * — still two orders of magnitude inside Long range.
  *
  * Scale design (the loop is 2 joins + 1 aggregate per iteration):
  *  - the edge set is hash-partitioned by `src` ONCE and cached; the
  *    per-iteration shares⋈edges join reuses that layout, so each
  *    iteration shuffles only the O(nodes) rank table, never the
  *    O(edges) edge table;
  *  - the rank and degree tables are O(nodes) and usually broadcastable;
  *    when not, they hash-join on the same `src` key;
  *  - the received-token aggregate is a sum, so map-side partial
  *    aggregation absorbs hub in-degree skew before the shuffle;
  *  - each iteration `localCheckpoint`s the rank table (lazily) to keep
  *    lineage flat — iteration i's plan does not re-derive iterations
  *    1..i-1.
  *
  * Dangling nodes (no out-edges) keep receiving but send nothing — their
  * inbound mass simply decays (the "mass leaks" formulation). Classic
  * redistribute-to-all semantics would need one extra scalar per
  * iteration; callers that need it can add the constant outside.
  */
object PageRank {

  /** (id, tokens) for every node incident to an edge, after `iterations`
    * rounds. Edges are directed; for an undirected graph pass both
    * directions. Duplicate edges count twice (multigraph semantics) —
    * `distinct()` upstream if that is not wanted.
    */
  def run(edges: DataFrame, iterations: Int,
      srcCol: String = "src", dstCol: String = "dst",
      initTokens: Long = 1000000L, resetTokens: Long = 150000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // keyed by `id` so the per-iteration joins are using-column joins —
    // deg and nodes share lineage with e, and dataframe-qualified refs
    // (deg("src")) would trip the ambiguous-self-join check
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = nodes.withColumn("tokens", lit(initTokens))
    for (i <- 1 to iterations) {
      // dangling nodes drop out of the inner join: they send nothing
      val shares = ranks.join(deg, "id")
        .select(col("id").as("src"), expr("tokens div deg").as("share"))
      val received = e.join(shares, "src")
        .groupBy("dst").agg(sum("share").as("rec"))
        .withColumnRenamed("dst", "id")
      ranks = nodes.join(received, Seq("id"), "left")
        .select(col("id"),
          (lit(resetTokens) +
            expr(s"($dampNum * coalesce(rec, 0L)) div $dampDen"))
            .as("tokens"))
        // intermediates checkpoint lazily (flat lineage, no extra job);
        // the last round is eager so the cached edge/deg/node tables can
        // be released before returning — callers read the checkpointed
        // result, and a session running many queries doesn't accumulate
        // per-run caches
        .localCheckpoint(eager = i == iterations)
    }
    if (iterations > 0) {
      e.unpersist(); deg.unpersist(); nodes.unpersist()
    } else {
      e.unpersist(); deg.unpersist() // ranks still reads nodes lazily
    }
    ranks
  }
}
