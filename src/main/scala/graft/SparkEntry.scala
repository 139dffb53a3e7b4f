package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DedupQueries, GraphQueries, MultimodalQueries, RelationalQueries, SimilarityQueries, StreamingQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the driver testdata, paired (when SQL-expressible)
  * with DuckDB oracle SQL the driver replays on the same parquet tables.
  */
object SparkEntry {

  /** The full registry, merged from the per-layer modules. */
  lazy val registry: Map[String, QueryDef] =
    RelationalQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      TextQueries.defs ++ MultimodalQueries.defs ++ StreamingQueries.defs ++
      GraphQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("rel_join_broadcast_agg").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }
}
