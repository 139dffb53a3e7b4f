package graft.beacon

import org.apache.spark.sql.types._

/** The authoritative typed schemas of the import stage — the reference
  * declares them once, in Postgres DDL (sql/create_tmp_tables.sql:1-41);
  * here they are StructTypes plus a DDL generator for the JDBC/psql
  * deployment path (S6 in SURVEY.md §2.1). JSON travels as StringType
  * carrying serialized objects (jsonb on the database side).
  */
object StagingSchemas {

  val tmpOriginalTriageNeeds: StructType = StructType(Seq(
    StructField("nhs_number", StringType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("created_at", DateType, nullable = false),
    StructField("updated_at", DateType, nullable = false),
    StructField("completed_on", DateType)))

  val tmpOriginalTriageNotes: StructType = StructType(Seq(
    StructField("nhs_number", StringType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("created_at", DateType, nullable = false),
    StructField("updated_at", DateType, nullable = false),
    StructField("import_data", StringType))) // jsonb

  val tmpIdentifiedNeeds: StructType = StructType(Seq(
    StructField("nhs_number", StringType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("name", StringType),
    StructField("created_at", DateType, nullable = false),
    StructField("updated_at", DateType, nullable = false),
    StructField("completed_on", DateType),
    StructField("supplemental_data", StringType), // jsonb
    StructField("user_id", LongType),
    StructField("start_on", DateType)))

  val tmpContactProfileUpdates: StructType = StructType(Seq(
    StructField("nhs_number", StringType, nullable = false),
    StructField("additional_info", StringType),
    StructField("delivery_details", StringType),
    StructField("dietary_details", StringType),
    StructField("has_covid_symptoms", BooleanType)))

  val all: Map[String, StructType] = Map(
    "tmp_original_triage_needs" -> tmpOriginalTriageNeeds,
    "tmp_original_triage_notes" -> tmpOriginalTriageNotes,
    "tmp_identified_needs" -> tmpIdentifiedNeeds,
    "tmp_contact_profile_updates" -> tmpContactProfileUpdates)

  /** Columns whose database type is jsonb (StringType in-engine). */
  private[beacon] val jsonbColumns = Set("import_data", "supplemental_data")

  private def pgType(name: String, dt: DataType): String = dt match {
    case _ if jsonbColumns(name) => "jsonb"
    case StringType => "text"
    case DateType => "date"
    case BooleanType => "boolean"
    case LongType => "bigint"
    case other => throw new IllegalArgumentException(s"unmapped type $other")
  }

  /** Postgres DDL for one staging table (matches the reference's DDL
    * modulo whitespace). */
  def ddl(table: String): String = {
    val schema = all(table)
    val cols = schema.fields.map { f =>
      val notNull = if (f.nullable) "" else " NOT NULL"
      s"  ${f.name} ${pgType(f.name, f.dataType)}$notNull"
    }.mkString(",\n")
    s"DROP TABLE IF EXISTS $table;\nCREATE TABLE $table (\n$cols\n);"
  }

  def allDdl: String = all.keys.toSeq.sorted.map(ddl).mkString("\n\n")
}
