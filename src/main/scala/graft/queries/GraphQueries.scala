package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{LabelPropagation, PageRank}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the customer–supplier interaction graph derived
  * from the star schema (who bought from whom, via orders⋈lineitem).
  * Complements the dedup pipeline's connected components
  * (graft.operators.ConnectedComponents) with the two other staple
  * distributed graph workloads: iterative rank propagation and bipartite
  * motif counting.
  *
  * Both queries are exact integer computations (see PageRank's
  * determinism note) so the DuckDB oracle replays them bit-identically —
  * the PageRank oracle unrolls the iteration loop as chained CTEs, the
  * same cross-engine pattern as td_bpe_train's unrolled merge loop.
  */
object GraphQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Iters = 3

  /** Bipartite customer→supplier edge set; node ids disambiguated by
    * parity (customer c ↦ 2c, supplier s ↦ 2s+1) so both sides live in
    * one Long id space. */
  private def bipartiteEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

  /** The oracle's unrolled PageRank iteration: rK → rK+1. Kept in exact
    * lockstep with PageRank.run's loop body (share = tokens // deg,
    * refresh = 150000 + 85·received // 100; DuckDB's `//` and Spark's
    * `div` both floor, and everything here is non-negative). The sum of
    * BIGINT shares is HUGEINT in DuckDB — the final projection casts
    * back down. */
  private def oracleIter(k: Int): String = {
    val (prev, cur) = (s"r${k - 1}", s"r$k")
    s"""s$k AS (SELECT e.dst AS id, sum(r.tokens // d.deg) AS rec
       |  FROM edges e JOIN $prev r ON e.src = r.id
       |  JOIN deg d ON d.src = e.src GROUP BY 1),
       |$cur AS (SELECT n.id,
       |    CAST(150000 + (85 * COALESCE(s.rec, 0)) // 100 AS BIGINT)
       |      AS tokens
       |  FROM nodes n LEFT JOIN s$k s ON n.id = s.id)""".stripMargin
  }

  /** k-core peel threshold for rel_graph_kcore. 10 peels a real first
    * wave at every fixture SF and stays non-empty at the sf0.001 smoke
    * scale too (the bimodal degree profile — customers ≤ ~67,
    * suppliers ≥ ~440 — converges after one wave at these SFs;
    * multi-round cascades are pinned in KCoreSpec on crafted graphs
    * where each round peels a new layer). */
  private val CoreK = 10

  /** The oracle's unrolled k-core peel: s(K-1) → sK (drop vertices
    * whose degree in the survivor-induced subgraph is < CoreK). Kept in
    * lockstep with KCore.run's round body. */
  private def kcoreOracleIter(k: Int): String = {
    val (prev, cur) = (s"s${k - 1}", s"s$k")
    s"""d$k AS (SELECT e.src AS id, count(*) AS deg FROM edges e
       |  JOIN $prev a ON e.src = a.id JOIN $prev b ON e.dst = b.id
       |  GROUP BY 1),
       |$cur AS (SELECT id FROM d$k WHERE deg >= $CoreK)""".stripMargin
  }

  /** The oracle's unrolled LPA iteration: l(K-1) → lK. Mode-with-ties-
    * to-smallest replayed as a count + row_number window (deterministic,
    * so it matches LabelPropagation.run's max(struct(cnt, -lbl)) exactly
    * even though the plans differ). Every node appears as a src in the
    * both-direction edge list, so the per-src mode covers all nodes. */
  private def lpaOracleIter(k: Int): String = {
    val (prev, cur) = (s"l${k - 1}", s"l$k")
    s"""$cur AS (SELECT src AS id, lbl FROM (
       |  SELECT e.src, r.lbl, row_number() OVER (
       |      PARTITION BY e.src ORDER BY count(*) DESC, r.lbl) AS rn
       |  FROM edges e JOIN $prev r ON e.dst = r.id
       |  GROUP BY e.src, r.lbl) WHERE rn = 1)""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- LABEL PROPAGATION: synchronous LPA community detection over
    // the same undirected customer–supplier graph as PageRank —
    // deterministic (smallest-label ties), so the communities are a
    // pure function of the graph and hash-compare cross-engine. See
    // operators.LabelPropagation for the per-iteration plan.
    "rel_graph_labelprop" -> QueryDef.sql(
      s"$Iters-round synchronous label propagation communities")(
      s"""WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |         l.l_suppkey * 2 + 1 AS dst
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT src, dst FROM e0
        |          UNION ALL SELECT dst, src FROM e0),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |l0 AS (SELECT id, id AS lbl FROM nodes),
        |${(1 to Iters).map(lpaOracleIter).mkString(",\n")}
        |SELECT id AS node_id,
        |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |    AS node_type,
        |  lbl AS community
        |FROM l$Iters ORDER BY node_id""".stripMargin) { (s, dir) =>
      val e0 = bipartiteEdges(s, dir)
      val undirected = e0.union(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      LabelPropagation.run(undirected, Iters)
        .select(col("id").as("node_id"),
          when(col("id") % 2 === 0, lit("customer"))
            .otherwise(lit("supplier")).as("node_type"),
          col("lbl").as("community"))
        .orderBy("node_id")
    },

    // ---- PAGERANK: 3 rounds of integer token passing over the
    // undirected (both-direction) customer–supplier graph. Customers
    // with broad supplier reach and suppliers serving many customers
    // accumulate tokens; the bipartite structure means rank flows
    // strictly across sides each round.
    "rel_graph_pagerank" -> QueryDef.sql(
      s"$Iters-round integer-token PageRank over the customer–supplier graph")(
      s"""WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |         l.l_suppkey * 2 + 1 AS dst
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT src, dst FROM e0
        |          UNION ALL SELECT dst, src FROM e0),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS tokens FROM nodes),
        |${(1 to Iters).map(oracleIter).mkString(",\n")}
        |SELECT id AS node_id,
        |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |    AS node_type,
        |  tokens
        |FROM r$Iters ORDER BY node_id""".stripMargin) { (s, dir) =>
      val e0 = bipartiteEdges(s, dir)
      val undirected = e0.union(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      PageRank.run(undirected, Iters)
        .select(col("id").as("node_id"),
          when(col("id") % 2 === 0, lit("customer"))
            .otherwise(lit("supplier")).as("node_type"),
          col("tokens"))
        .orderBy("node_id")
    },

    // ---- BUTTERFLY COUNTING, GLOBAL: 2×2 bicliques in the purchase
    // graph — the bipartite analogue of a triangle count (cohesion of
    // the purchasing graph). The Spark side runs the SAME vertex-
    // priority enumeration as rel_graph_butterfly_vp (each butterfly
    // generated exactly once from its ≻-max (u, w) pair; hub-degree²
    // wedge volume never materializes — operators/Butterfly.scala), so
    // no registry query anywhere materializes the naive wedge set. The
    // DuckDB oracle is the INDEPENDENT quadratic pair computation —
    // cheap at oracle SF, and a hash match proves the once-per-
    // butterfly enumeration is exact. The naive per-pair form survives
    // only as the spec-level cross-check (ButterflySpec's random-graph
    // oracle); its per-pair output (bf, n_partners per (s1,s2)) is
    // expressible only by materializing every pair — the measured
    // 12.9G-row wedge set at 50× (BASELINE.md, graft.tools.GraphStress)
    // — which is precisely what the graded paths must never do.
    "rel_graph_butterfly" -> QueryDef.sql(
      "global butterfly (2×2 biclique) count in the purchase graph")(
      """WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |w AS (SELECT a.s AS s1, b.s AS s2, count(*) AS k
        |      FROM e a JOIN e b ON a.c = b.c AND a.s < b.s
        |      GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT CAST(sum((k * (k - 1)) // 2) AS BIGINT) AS butterflies
        |FROM w""".stripMargin) { (s, dir) =>
      graft.operators.Butterfly.globalCount(
        bipartiteEdges(s, dir), "src", "dst")
    },

    // ---- BUTTERFLY COUNTING, VERTEX-PRIORITY: the same per-supplier
    // butterfly totals computed by the scale-safe enumeration
    // (operators/Butterfly.scala — each wedge generated only from its
    // priority-max endpoint, so hub-degree² wedge volume never
    // materializes; see the operator Scaladoc for the exactness
    // argument). Attribution is adaptive: on this graph the probe
    // proves the k ≥ 2 pair table tiny (0.5M pairs vs 12.5M wedges at
    // sf0.1), so the wedge set joins a BROADCAST pair table and is
    // never hash-partitioned; dense graphs fall back to the windowed
    // single-exchange shape (both regimes plan-gated in ButterflySpec).
    // The DuckDB oracle is the INDEPENDENT naive pair
    // computation — at sf scale the quadratic oracle is cheap, and a
    // hash match proves the priority attribution is exact, not
    // approximate. Output drops n_partners: per-pair structure is
    // precisely what the priority enumeration avoids materializing.
    "rel_graph_butterfly_vp" -> QueryDef.sql(
      "per-supplier butterfly counts via vertex-priority wedge enumeration")(
      """WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |w AS (SELECT a.s AS s1, b.s AS s2, count(*) AS k
        |      FROM e a JOIN e b ON a.c = b.c AND a.s < b.s
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |v AS (SELECT s1 AS s, (k * (k - 1)) // 2 AS bf FROM w
        |      UNION ALL SELECT s2 AS s, (k * (k - 1)) // 2 AS bf FROM w)
        |SELECT s AS suppkey, CAST(sum(bf) AS BIGINT) AS butterflies
        |FROM v GROUP BY 1 ORDER BY suppkey""".stripMargin) { (s, dir) =>
      graft.operators.Butterfly.perVertexCounts(
          bipartiteEdges(s, dir), "src", "dst")
        .filter(col("id") % 2 === 1) // supplier side of the id encoding
        .select(expr("(id - 1) div 2").as("suppkey"), col("butterflies"))
        .orderBy("suppkey")
    },

    // ---- K-CORE PEELING: 3 synchronous peel rounds at threshold CoreK
    // over the undirected customer–supplier graph — the dense-scaffold
    // extractor (operators/KCore.scala; per round one map-side-combined
    // degree count over the cached edge table + two survivor
    // semi-joins). Bounded rounds keep the result a pure function of
    // the graph, so the oracle unrolls the peel as chained CTEs — the
    // same cross-engine pattern as PageRank/LPA — and the reported
    // core_deg is the induced degree within the FINAL survivor set.
    "rel_graph_kcore" -> QueryDef.sql(
      s"$Iters-round k-core peel (k=$CoreK) over the purchase graph")(
      s"""WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |         l.l_suppkey * 2 + 1 AS dst
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT src, dst FROM e0
        |          UNION ALL SELECT dst, src FROM e0),
        |s0 AS (SELECT DISTINCT src AS id FROM edges),
        |${(1 to Iters).map(kcoreOracleIter).mkString(",\n")},
        |fd AS (SELECT e.src AS id, count(*) AS deg FROM edges e
        |       JOIN s$Iters a ON e.src = a.id
        |       JOIN s$Iters b ON e.dst = b.id GROUP BY 1)
        |SELECT id AS node_id,
        |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |    AS node_type,
        |  CAST(deg AS BIGINT) AS core_deg
        |FROM fd ORDER BY node_id""".stripMargin) { (s, dir) =>
      val e0 = bipartiteEdges(s, dir)
      val undirected = e0.union(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.KCore.run(undirected, CoreK, Iters)
        .select(col("id").as("node_id"),
          when(col("id") % 2 === 0, lit("customer"))
            .otherwise(lit("supplier")).as("node_type"),
          col("deg").as("core_deg"))
        .orderBy("node_id")
    }
  )
}
