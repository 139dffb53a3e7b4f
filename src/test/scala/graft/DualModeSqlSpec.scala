package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL FRONT DOOR, result-checked: every query below runs BOTH as
  * its registry DataFrame build AND as SQL text through `spark.sql`
  * (the stored oracle SQL, which for this subset is engine-neutral
  * ANSI), and the two results must be row-identical. This is the
  * dual-mode guarantee a Spark-native engine owes its users — the
  * DataFrame API and SQL text resolve to the same Catalyst plans — and
  * it also routes the custom machinery through the SQL path: the
  * TopKPerKey rewrite rule fires on the window-SQL form
  * (rel_topk_per_key), and the graft_* function registry resolves from
  * SQL text (covered separately below with session_window, whose
  * DuckDB oracle is not ANSI-portable).
  */
class DualModeSqlSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val views: Unit =
    for (name <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      Tables.load(spark, sfDir, name).createOrReplaceTempView(name)

  /** Oracle SQL that is valid in BOTH DuckDB and Spark for these
    * queries (the registry keeps one text; this subset avoids DuckDB-
    * only forms like `//`, epoch_us, unnest, list_*). */
  private val dualMode = Seq(
    "rel_project_derive", "rel_filter_project", "rel_agg_group",
    "rel_join_broadcast_agg", "rel_join_big", "rel_first_per_key",
    "rel_window_running", "rel_window_funcs",
    "rel_sort_limit", "rel_distinct", "rel_left_join_coalesce",
    "rel_semi_anti", "rel_set_ops", "rel_rollup", "rel_grouping_sets",
    "rel_cube", "rel_topk_per_key", "rel_lateral_topk",
    "td_quantile_hist", "td_funnel_convert",
    "rel_skew_salted_join", "rel_upsert_merge", "rel_scd2_intervals",
    "rel_bloom_join", "rel_graph_labelprop", "rel_event_transitions")
  // rel_scalar_subquery and rel_lateral_topk already BUILD via
  // spark.sql text in the registry; rel_window_range_frame and
  // rel_scalar_subquery oracles use DuckDB-only epoch_us / `//`, so
  // they are excluded from the shared-text subset here.

  /** Second tier: oracles whose text differs from valid Spark SQL by a
    * MECHANICAL token rewrite only (DuckDB floor-div `//` ↔ Spark
    * `div`; `epoch_us` ↔ `unix_micros`). The rewrite is applied to the
    * stored oracle and the result must match the DataFrame build — so
    * these queries too have a working SQL front door, one find/replace
    * away from the cross-engine text. */
  private val rewritten: Seq[(String, String => String)] = Seq(
    "rel_graph_pagerank" -> (_.replace("//", "div")),
    "rel_graph_butterfly" -> (_.replace("//", "div")),
    "rel_graph_butterfly_vp" -> (_.replace("//", "div")),
    "rel_rolling_outlier" -> (_.replace("epoch_us(", "unix_micros(")))

  for (name <- dualMode) {
    test(s"$name: SQL text and DataFrame build return identical results") {
      views
      val q = SparkEntry.registry(name)
      val fromSql = spark.sql(q.oracle.get)
      val fromDf = q.build(spark, sfDir)
      assert(fromSql.columns.toSeq == fromDf.columns.toSeq,
        s"column mismatch for $name")
      val a = fromSql.collect().toSeq
      val b = fromDf.collect().toSeq
      assert(a == b, s"$name: SQL row set diverges from DataFrame row set")
    }
  }

  for ((name, rw) <- rewritten) {
    test(s"$name: dialect-rewritten oracle SQL matches the DataFrame build") {
      views
      val q = SparkEntry.registry(name)
      val fromSql = spark.sql(rw(q.oracle.get))
      val fromDf = q.build(spark, sfDir)
      assert(fromSql.columns.toSeq == fromDf.columns.toSeq,
        s"column mismatch for $name")
      val a = fromSql.collect().toSeq
      val b = fromDf.collect().toSeq
      assert(a.nonEmpty && a == b,
        s"$name: SQL row set diverges from DataFrame row set")
    }
  }

  test("session_window SQL text matches the DataFrame build (batch)") {
    views
    val sql = spark.sql(
      """SELECT session_window(ts, '30 minutes').start AS s_start,
        |       user_id, count(*) AS n
        |FROM events GROUP BY session_window(ts, '30 minutes'), user_id
        |ORDER BY user_id, s_start""".stripMargin).collect().toSeq
    val df = Tables.load(spark, sfDir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"), col("user_id"),
        col("n"))
      .orderBy("user_id", "s_start").collect().toSeq
    assert(sql.nonEmpty && sql == df)
  }

  // ---- Third tier: round-6 queries whose ORACLE is written in
  // DuckDB's list dialect (list_transform / list_reduce / unnest /
  // 1-based [] indexing) but whose semantics are fully expressible in
  // Spark SQL's higher-order-function dialect (transform / aggregate /
  // zip_with / posexplode). The Spark text below is hand-kept in
  // lockstep with the registry's DataFrame build — same arithmetic
  // association, same tie-breaks — so the row sets must be identical
  // bit-for-bit, doubles included.
  //
  // Documented EXCLUSIONS from the SQL front door (API-only):
  //  - td_bpe_train / td_bpe_encode: the trainer is a data-dependent
  //    iterative loop — merge k+1's argmax depends on merge k's
  //    replace, so there is no single SQL text in EITHER engine; the
  //    DuckDB oracle is itself generated by unrolling the loop to the
  //    configured merge count (TextQueries.bpeTrainOracle). The
  //    recursive-CTE front door (rel_recursive_cte / UnionLoop) covers
  //    fixed-rule iteration, not per-round argmax.
  //  - st_* streaming queries: readStream has no SQL surface in Spark.

  test("td_kmeans_lloyd: Spark-dialect SQL text matches the DataFrame build") {
    views
    val fromSql = spark.sql(
      """WITH xm AS (SELECT vec_id,
        |         transform(CAST(embedding AS ARRAY<DOUBLE>),
        |           x -> CAST(CAST(round(x * 1000000) AS BIGINT) AS DOUBLE))
        |           AS xm
        |       FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, xm AS cm FROM xm WHERE vec_id < 8),
        |a1 AS (SELECT vec_id, xm, cell FROM (
        |  SELECT x.vec_id, x.xm, c.cid AS cell, row_number() OVER (
        |      PARTITION BY x.vec_id ORDER BY
        |      aggregate(zip_with(x.xm, c.cm, (p, q) -> (p - q) * (p - q)),
        |        CAST(0.0 AS DOUBLE), (p, q) -> p + q) ASC, c.cid) AS rn
        |  FROM xm x CROSS JOIN c0 c) WHERE rn = 1),
        |s1 AS (SELECT cell, pos,
        |         CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS sm,
        |         count(*) AS n
        |       FROM (SELECT cell, posexplode(xm) AS (pos, v) FROM a1)
        |       GROUP BY cell, pos),
        |c1 AS (SELECT cell AS cid,
        |         transform(array_sort(collect_list(named_struct(
        |             'pos', pos, 'cme', CAST(sm AS DOUBLE) / n))),
        |           p -> p.cme) AS cm
        |       FROM s1 GROUP BY cell),
        |a2 AS (SELECT vec_id, cell_seed, cell_lloyd FROM (
        |  SELECT x.vec_id, x.cell AS cell_seed, c.cid AS cell_lloyd,
        |    row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |      aggregate(zip_with(x.xm, c.cm, (p, q) -> (p - q) * (p - q)),
        |        CAST(0.0 AS DOUBLE), (p, q) -> p + q) ASC, c.cid) AS rn
        |  FROM a1 x CROSS JOIN c1 c) WHERE rn = 1)
        |SELECT vec_id, cell_seed, cell_lloyd,
        |       cell_seed <> cell_lloyd AS moved
        |FROM a2 ORDER BY vec_id""".stripMargin)
    val fromDf = SparkEntry.registry("td_kmeans_lloyd").build(spark, sfDir)
    assert(fromSql.columns.toSeq == fromDf.columns.toSeq)
    val a = fromSql.collect().toSeq
    assert(a.nonEmpty && a == fromDf.collect().toSeq)
  }

  test("td_pmi_collocations: Spark-dialect SQL text matches the DataFrame build") {
    views
    val fromSql = spark.sql(
      """WITH tk AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
        |uni AS (SELECT w, count(*) AS c FROM (
        |          SELECT explode(toks) AS w FROM tk) GROUP BY w),
        |big AS (SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS c12 FROM (
        |          SELECT explode(zip_with(
        |              slice(toks, 1, size(toks) - 1),
        |              slice(toks, 2, size(toks) - 1),
        |              (a, b) -> named_struct('w1', a, 'w2', b))) AS bg
        |          FROM tk WHERE size(toks) >= 2) GROUP BY 1, 2),
        |st AS (SELECT (SELECT sum(c) FROM uni) AS n_tok,
        |              (SELECT sum(c12) FROM big) AS n_big),
        |sc AS (SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
        |         CAST(b.c12 AS DOUBLE) * st.n_tok * st.n_tok /
        |           (CAST(u1.c AS DOUBLE) * u2.c * st.n_big) AS lift
        |       FROM big b JOIN uni u1 ON b.w1 = u1.w
        |                  JOIN uni u2 ON b.w2 = u2.w
        |       CROSS JOIN st)
        |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT)
        |         AS c1, CAST(c2 AS BIGINT) AS c2, lift,
        |       CAST(rnk AS INT) AS rnk FROM (
        |  SELECT *, row_number() OVER (ORDER BY lift DESC, w1, w2) AS rnk
        |  FROM sc)
        |WHERE rnk <= 50 ORDER BY rnk""".stripMargin)
    val fromDf = SparkEntry.registry("td_pmi_collocations").build(spark, sfDir)
    assert(fromSql.columns.toSeq == fromDf.columns.toSeq)
    val a = fromSql.collect().toSeq
    assert(a.nonEmpty && a == fromDf.collect().toSeq)
  }

  test("graft_* functions from SQL text match the Column API") {
    views
    val sql = spark.sql(
      """SELECT doc_id, graft_nfc(text) AS norm,
        |       graft_char_ngrams(substring(text, 1, 40), 3) AS ng
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin)
      .collect().toSeq
    val df = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.nfc(col("text")).as("norm"),
        graft.functions.GraftFunctions
          .charNGrams(substring(col("text"), 1, 40), 3).as("ng"))
      .orderBy("doc_id").limit(200).collect().toSeq
    assert(sql.nonEmpty && sql == df)
  }
}
