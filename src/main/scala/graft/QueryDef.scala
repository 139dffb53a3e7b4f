package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registry entry: a Spark query over the testdata tables plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver replays
  * on the same parquet tables. Column names/aliases MUST match between
  * the two — the driver's compare sorts columns by name before hashing.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  def sql(doc: String)(oracleSql: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, Some(oracleSql), doc)

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def rowsOnly(doc: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None, doc)
}
