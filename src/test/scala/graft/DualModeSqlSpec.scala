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
        "orders", "lineitem", "events", "documents"))
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
    "rel_bloom_join", "rel_graph_labelprop")
  // rel_scalar_subquery and rel_lateral_topk already BUILD via
  // spark.sql text in the registry; rel_window_range_frame and
  // rel_scalar_subquery oracles use DuckDB-only epoch_us / `//`, so
  // they are excluded from the shared-text subset here.

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
