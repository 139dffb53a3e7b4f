package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-vertex butterfly (2×2 biclique) counting over a bipartite
  * edge list via VERTEX-PRIORITY wedge enumeration (the counting
  * discipline of Wang/Lin/Qin/Zhang, "Vertex Priority Based Butterfly
  * Counting for Large-scale Bipartite Networks", VLDB'19).
  *
  * The naive formulation self-joins the edge list on the shared vertex
  * and materializes EVERY wedge: Σ_v C(deg(v), 2) rows, quadratic in
  * hub degree — one customer connected to 10^5 suppliers contributes
  * ~5·10^9 wedges on its own. The vertex-priority rule instead
  * enumerates a wedge (u —v— w) ONLY from its highest-priority vertex:
  * it is generated iff u ≻ v and u ≻ w, where x ≻ y means
  * (deg(x), then smaller id as tie-break) orders x above y. Every
  * butterfly {u, w, v₁, v₂} is then formed exactly once — from its
  * ≻-maximal vertex u paired with its same-side partner w (all of
  * v₁, v₂, w rank below u by maximality; from ANY other vertex of the
  * four the rule rejects at least one leg) — and enumeration work drops
  * to O(Σ_{(u,v)∈E} min(deg u, deg v)): a hub's wedges are walked from
  * the hub itself at Σ_{s∈N(hub)} deg(s) cost (linear in its edges
  * times average partner degree), never deg(hub)² through it. A
  * million-customer hub becomes ~deg·d̄ work instead of deg².
  *
  * Per-vertex exactness: for an enumerated pair (u, w) with k common
  * enumerated centers, the C(k,2) butterflies each contain u and w once
  * — attribute C(k,2) to both endpoints — and each wedge row's center v
  * lies in k−1 of them — attribute k−1 per wedge row. Summed, every
  * butterfly credits each of its 4 vertices exactly once, so the
  * per-vertex totals equal the naive per-pair C(shared, 2) attribution
  * (ButterflySpec cross-validates against a naive oracle on random
  * graphs; rel_graph_butterfly_vp hash-checks it against DuckDB's
  * naive SQL).
  *
  * Plan shape: degree aggregate (1 shuffle, map-side combined), two
  * O(nodes) degree joins (broadcast under the same node-count ceiling
  * as [[PageRank]]), the wedge equi-join on the center (1 shuffle of
  * the priority-pruned adjacency), then ONE aggregation of the reduced
  * wedge set into the k ≥ 2 pair table (map-side combined) and — for
  * per-vertex counts — a broadcast join-back of the wedges against
  * that small pair table for center attribution. AQE skew-join
  * splitting still applies to whatever residual skew the priority rule
  * leaves.
  */
object Butterfly {

  /** Priority-pruned wedges (u, w, v): u the ≻-max start, w the other
    * endpoint (same side as u), v the center. Exposed for the
    * GraphStress harness to measure enumerated-wedge volume. */
  def wedges(edges: DataFrame, aCol: String = "a", bCol: String = "b")
      : DataFrame = {
    // simple-graph semantics: C(shared, 2) math assumes each edge once
    // (map-side combine absorbs the dedup's shuffle on already-distinct
    // input; correctness cannot be left to the caller)
    val e = edges.select(col(aCol).cast("long").as("x"),
      col(bCol).cast("long").as("y")).distinct()
    val und = e.union(e.select(col("y"), col("x")))
    val deg = und.groupBy("x").agg(count(lit(1)).as("d"))
      .select(col("x").as("id"), col("d"))

    val limit = edges.sparkSession.conf
      .getOption("spark.graft.pagerank.broadcastNodeLimit")
      .map(_.toLong).getOrElse(PageRank.DefaultBroadcastNodeLimit)
    val small = deg.count() <= limit
    def bcast(df: DataFrame) = if (small) broadcast(df) else df

    // priority as an orderable struct: deg first, then SMALLER id wins
    // ties (negate so lexicographic > is the ≻ comparator — no packed
    // long, no overflow)
    val adj = und
      .join(bcast(deg.select(col("id").as("x"), col("d").as("dx"))), "x")
      .join(bcast(deg.select(col("id").as("y"), col("d").as("dy"))), "y")
      .select(col("x"), col("y"),
        struct(col("dx"), (-col("x")).as("t")).as("px"),
        struct(col("dy"), (-col("y")).as("t")).as("py"))

    // first leg keeps only start-dominates-center edges — this is the
    // pruning: a hub is almost never a center, only a start
    val leg1 = adj.filter(col("px") > col("py"))
      .select(col("x").as("u"), col("y").as("v"), col("px").as("pu"))
    val leg2 = adj
      .select(col("x").as("v"), col("y").as("w"), col("py").as("pw"))
    leg1.join(leg2, "v")
      .filter(col("pu") > col("pw") && col("w") =!= col("u"))
      .select(col("u"), col("w"), col("v"))
  }

  /** Aggregated pair table (u, w, k): the k ≥ 2 enumerated pairs with
    * their common-center counts. The ONE exchange of the wedge set in
    * the counting plans — and map-side combine means the exchange
    * carries per-partition (u, w) partial counts, not raw wedges. The
    * k = 1 pairs (the overwhelming majority on a sparse graph) are
    * dropped before anything downstream touches them: they contribute
    * C(1, 2) = 0 to endpoints and k − 1 = 0 to centers, so filtering
    * them here shrinks the table joined back in [[perVertexCounts]] to
    * butterfly-participating pairs only. */
  private def pairCounts(wd: DataFrame): DataFrame =
    wd.groupBy("u", "w").agg(count(lit(1)).as("k"))
      .filter(col("k") >= 2)

  /** Single-row global butterfly total. Every butterfly is enumerated
    * exactly once — from its ≻-maximal vertex u paired with its unique
    * same-side partner w — so summing C(k, 2) over the distinct
    * enumerated (u, w) pairs counts each butterfly once, with no naive
    * pair materialization anywhere in the plan. Null (not 0) whenever
    * the graph holds no butterfly — including wedges-but-no-shared-pair
    * graphs, since [[pairCounts]] drops k = 1 pairs — matching SQL
    * `sum` over an empty set (the DuckDB oracle's HAVING count(*) >= 2
    * produces the same empty input; ButterflySpec pins the case). */
  def globalCount(edges: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame =
    pairCounts(wedges(edges, aCol, bCol))
      .agg(sum(expr("k * (k - 1) div 2")).cast("long").as("butterflies"))

  /** (id, butterflies) for every vertex participating in at least one
    * butterfly — exact counts, both sides of the bipartition.
    *
    * One wedge-set exchange total: the wedge set is hash-partitioned
    * by (u, w) ONCE — exchange reuse shares that single shuffle across
    * both consumers — after which the pair aggregation needs no
    * exchange (its grouping keys match the partitioning) and the
    * center join-back runs co-partitioned on both sides (the pair
    * table inherits the same (u, w) partitioning from its agg), so
    * neither wedges nor pairs move again; the only further shuffles
    * are the O(vertices) attribution partials. (The previous shape —
    * a count window over (u, w), a distinct() for pair extraction,
    * and the attribution union — exchanged the full wedge set three
    * times: 275 MB warm shuffle at sf0.1. An AQE-broadcast join-back
    * doesn't happen in practice: AQE sizes the aggregated side by its
    * pre-agg exchange bytes, which is the wedge set itself.) */
  def perVertexCounts(edges: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    val wd = wedges(edges, aCol, bCol)
    // The trailing repartition is a deliberate stage boundary: without
    // it the pair aggregation fuses into the join stage and AQE can
    // only see the PRE-agg exchange (wedge-set-sized partials), so the
    // join-back below always stays sort-merge and re-exchanges the
    // wedge set. With the boundary, AQE measures the aggregated k >= 2
    // pair table itself (tiny on sparse graphs) and converts the
    // join-back to broadcast — the wedge set is then never exchanged
    // after the aggregation. If the pair table really is huge the
    // boundary costs one exchange of the (already reduced) output and
    // the join falls back to sort-merge with a co-partitioned build
    // side: adaptive, not a blanket broadcast hint.
    val pairs = wd.groupBy("u", "w").agg(count(lit(1)).as("k"))
      .filter(col("k") >= 2)
      .repartition(col("u"), col("w"))
    // endpoints: C(k,2) butterflies from pair (u, w) contain each once
    val pairTerms = pairs
      .select(explode(array(col("u"), col("w"))).as("id"),
        expr("k * (k - 1) div 2").as("bf"))
    // centers: wedge (u, w, v) pairs v with the k-1 other centers; the
    // inner join also drops wedges of k = 1 pairs (zero contribution)
    val centerTerms = wd.join(pairs, Seq("u", "w"))
      .select(col("v").as("id"), (col("k") - 1).as("bf"))
    pairTerms.union(centerTerms)
      .groupBy("id").agg(sum("bf").as("butterflies"))
      .filter(col("butterflies") > 0)
  }
}
