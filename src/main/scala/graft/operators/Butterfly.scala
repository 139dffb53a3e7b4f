package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * the priority-pruned adjacency), then ONE movement of the reduced
  * wedge set: globalCount aggregates it straight into the k ≥ 2 pair
  * table (map-side combined); perVertexCounts hash-partitions it by
  * (u, w) once — a single reused exchange — after which the count
  * window, pair distinct, and center attribution all run
  * co-partitioned with zero further exchanges. AQE skew-join splitting
  * still applies to whatever residual skew the priority rule leaves.
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
    * their common-center counts — [[globalCount]]'s single wedge-set
    * exchange, map-side combined so it carries per-partition (u, w)
    * partial counts, not raw wedges. The k = 1 pairs contribute
    * C(1, 2) = 0 butterflies, and dropping them makes the empty-input
    * NULL semantics match the oracle's HAVING count(*) >= 2. */
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
    * by (u, w) ONCE — exchange reuse collapses both consumer branches
    * onto that single shuffle — after which the count window, the pair
    * distinct, and the center projection all run co-partitioned; the
    * only further shuffle is the O(vertices) attribution partials.
    * (The round-8 shape was this window WITHOUT the reuse parity:
    * column pruning dropped v from the endpoint branch's copy of the
    * exchange, the two structurally different exchanges defeated
    * reuse, and the wedge set shuffled — and enumerated — twice:
    * 275 MB warm shuffle and 14.6 s at sf0.1 vs 169 MB / 8.4 s now.) */
  def perVertexCounts(edges: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    // ONE movement of the wedge set, at every density: hash-partition
    // it by (u, w) once, then compute k as a count window over the
    // co-partitioned data (no join, no second table, no broadcast —
    // a broadcast join-back wins only while the k >= 2 pair table is
    // small, and dense or hub-heavy graphs, where butterfly counting
    // is hardest, are exactly where it is not). Both consumer branches
    // below share the identical exchange+window prefix, so exchange
    // reuse collapses them onto a single shuffle and a single
    // enumeration run.
    val wd = wedges(edges, aCol, bCol).repartition(col("u"), col("w"))
    // The row_number ordered by v is load-bearing twice over: it marks
    // one representative wedge per (u, w) pair (replacing a distinct),
    // and — because its sort key is v — it forces v to stay in the
    // endpoint branch's copy of the exchange. Without a live v
    // reference there, column pruning drops v from that branch (a
    // count(v) doesn't survive either: the optimizer rewrites count of
    // a non-nullable column to count(1)), the two consumers' exchanges
    // become structurally different, exchange reuse is defeated, and
    // the wedge set shuffles — and enumerates — twice, which was
    // round 8's 275 MB / 14.6 s defect. ButterflySpec pins the
    // one-reused-exchange plan shape.
    val byPair = Window.partitionBy("u", "w")
    val wdk = wd
      .withColumn("k", count(lit(1)).over(byPair))
      .withColumn("rn", row_number().over(byPair.orderBy("v")))
      .filter(col("k") >= 2) // k = 1 pairs contribute 0 everywhere
    // endpoints: C(k,2) butterflies from pair (u, w) contain each once
    val pairTerms = wdk.filter(col("rn") === 1)
      .select(explode(array(col("u"), col("w"))).as("id"),
        expr("k * (k - 1) div 2").as("bf"))
    // centers: wedge (u, w, v) pairs v with the k-1 other centers
    val centerTerms = wdk.select(col("v").as("id"), (col("k") - 1).as("bf"))
    pairTerms.union(centerTerms)
      .groupBy("id").agg(sum("bf").as("butterflies"))
      .filter(col("butterflies") > 0)
  }
}
