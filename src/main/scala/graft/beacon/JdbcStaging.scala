package graft.beacon

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct}
import org.apache.spark.sql.types.StructType

/** S5 (SURVEY.md §2.1): the database leg of the import stage. The
  * reference loads staging CSVs with psql `\COPY` into the tables of
  * sql/create_tmp_tables.sql (README.md:53,73-78) and runs the import
  * SQL in Postgres; the engine equivalent is `df.write.jdbc` of the
  * staging frames, the [[ImportStage]] jobs over `spark.read.jdbc`
  * frames, and a JDBC write-back of the results.
  *
  * The one impedance mismatch is struct columns: the engine's `_ord`
  * file-order struct (SURVEY.md §7.3.1) has no JDBC representation, so
  * write flattens every struct column into `parent__field` scalar
  * columns and read re-nests them — lossless for the non-nested structs
  * the beacon pipeline carries.
  *
  * Scale note: reads accept partitioning options (`partitionColumn` /
  * `numPartitions` / bounds) so a large staging table fans out across
  * executors; with none given the read is single-stream, which is the
  * right default for spreadsheet-scale staging data.
  */
object JdbcStaging {

  private val Sep = "__"

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  def write(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit = {
    // "__" is the struct-flattening separator — a top-level column using
    // it would be silently mis-nested on read; fail fast instead (struct
    // FIELD names may contain it: re-nesting splits on the first "__")
    val clash = df.schema.fields.filter(_.name.contains(Sep))
    require(clash.isEmpty,
      s"top-level column names may not contain '$Sep' (reserved for " +
        s"struct flattening): ${clash.map(_.name).mkString(", ")}")
    val flat = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case st: StructType =>
          st.fields.foldLeft(acc) { (a, sf) =>
            a.withColumn(s"${f.name}$Sep${sf.name}",
              col(s"`${f.name}`.`${sf.name}`"))
          }.drop(f.name)
        case _ => acc
      }
    }
    flat.write.mode("overwrite").jdbc(url, table, props(options))
  }

  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val raw = spark.read.jdbc(url, table, props(options))
    val nested = raw.columns.filter(_.contains(Sep))
      .groupBy(_.split(Sep, 2)(0)).toSeq.sortBy(_._1)
    nested.foldLeft(raw) { case (acc, (parent, fields)) =>
      // fields arrive in table order = write order = struct field order
      acc.withColumn(parent, struct(fields.toIndexedSeq.map(c =>
          col(s"`$c`").as(c.split(Sep, 2)(1))): _*))
        .drop(fields.toIndexedSeq: _*)
    }
  }
}
