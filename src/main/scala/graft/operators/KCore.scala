package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous k-core peeling (Seidman 1983's coreness decomposition,
  * run as the Matula–Beck peel in synchronous rounds): each round drops
  * every vertex whose degree in the SURVIVING induced subgraph is < k.
  * The fixpoint is the k-core — the standard dense-substructure /
  * spam-farm / community-scaffold extractor; a bounded round count
  * (like [[PageRank]]'s fixed iterations) keeps the result a pure
  * function of (graph, k, rounds), so the DuckDB oracle replays it as
  * unrolled CTEs and hash-compares bit-for-bit.
  *
  * Scale design, per round:
  *  - the O(edges) both-direction table is hash-partitioned by `src`
  *    once and cached, never reshuffled in the loop;
  *  - the O(survivors) vertex set joins in twice (a semi-join per
  *    endpoint) — broadcast below [[PageRank.DefaultBroadcastNodeLimit]]
  *    vertices, ordinary hash joins above (the same adaptive posture as
  *    LPA's label table);
  *  - the induced-degree count collapses map-side before its shuffle;
  *  - the survivor set is `localCheckpoint`ed EVERY round: it is
  *    referenced twice per round (both endpoint filters), so an
  *    unbounded lineage would double per round (LabelPropagation's
  *    argument verbatim), and the snapshot is only O(vertices).
  *
  * Monotonicity makes the bounded-round semantics useful: survivors
  * only shrink, so round t is exactly "vertices provably in the k-core
  * after t peel waves" — already converged on most graphs at small t.
  */
object KCore {

  /** Surviving (id, deg) — induced degree in the final survivor set —
    * after `rounds` synchronous peels at threshold `k`. Pass both edge
    * directions for an undirected graph; duplicate edges count twice
    * (multigraph degrees), `distinct()` upstream if unwanted. */
  def run(edges: DataFrame, k: Int, rounds: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    val base = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val limit = edges.sparkSession.conf
      .getOption("spark.graft.pagerank.broadcastNodeLimit")
      .map(_.toLong).getOrElse(PageRank.DefaultBroadcastNodeLimit)
    val small =
      base.select(col("src")).distinct().count() <= limit
    def bcast(df: DataFrame) = if (small) broadcast(df) else df

    // round 0 "survivors": every vertex (degrees checked in round 1)
    var alive = base.select(col("src").as("id")).distinct()
    var lastDeg: DataFrame = null
    for (r <- 1 to rounds) {
      // induced degree: count edges whose BOTH endpoints survive
      val indDeg = base
        .join(bcast(alive.select(col("id").as("src"))), Seq("src"),
          "left_semi")
        .join(bcast(alive.select(col("id").as("dst"))), Seq("dst"),
          "left_semi")
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      lastDeg = indDeg
      alive = indDeg.filter(col("deg") >= k)
        .select(col("src").as("id"))
        .localCheckpoint(eager = false)
    }
    // final induced degree of the SURVIVOR set (one more pass over the
    // cached edges, so the reported deg matches the returned vertices)
    val out = base
      .join(bcast(alive.select(col("id").as("src"))), Seq("src"),
        "left_semi")
      .join(bcast(alive.select(col("id").as("dst"))), Seq("dst"),
        "left_semi")
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
      .localCheckpoint(eager = true)
    base.unpersist()
    out
  }
}
