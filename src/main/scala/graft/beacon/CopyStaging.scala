package graft.beacon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, DateType, LongType, StringType}

/** The psql `\COPY` leg of S5: the reference loads the prepared CSVs
  * into Postgres staging tables with
  * `\COPY <table> (<cols>) FROM <file> DELIMITER ',' CSV HEADER`
  * (reference README.md:60-101), where Postgres enforces the DDL's
  * types at copy time — `jsonb` cells must parse as JSON, `NOT NULL`
  * columns reject empty cells, `date`/`boolean`/`bigint` cells must be
  * coercible (sql/create_tmp_tables.sql:1-41).
  *
  * No Postgres runs in this environment (the JDBC round-trip is proven
  * against embedded Derby, which has no `jsonb`), so this object closes
  * the dialect gap from the engine side: [[loadScript]] reproduces the
  * documented psql flow verbatim for the engine's CSV outputs, and
  * [[validate]] pre-flights a staging frame against the SAME rules
  * Postgres would apply at copy time — as ONE distributed aggregate
  * (zero per-row driver work), so a 100 TB staging frame validates at
  * scan speed before any bytes ship to the warehouse.
  *
  * Empty-cell semantics: the CSV sink writes both null and "" as an
  * empty cell ([[CsvIO]]), and `\COPY ... CSV` reads an unquoted empty
  * cell as NULL — so for copy purposes "" IS null, which is how the
  * checks below treat it.
  */
object CopyStaging {

  /** Literals Postgres' boolean input function accepts: every UNIQUE
    * case-insensitive prefix of true/false/yes/no/on/off plus 1/0
    * (bare "o" is ambiguous between on/off, so Postgres rejects it). */
  private val pgBoolLiterals = {
    val words = Seq("true", "false", "yes", "no", "on", "off")
    val prefixes = words.flatMap(w => (1 to w.length).map(w.take))
    prefixes.filter(p => words.count(_.startsWith(p)) == 1).toSet ++ Set("1", "0")
  }

  private def isEmpty(c: org.apache.spark.sql.Column, dt: DataType) =
    if (dt == StringType) c.isNull || c === "" else c.isNull

  /** Copy-time violation counts for `df` against staging table `table`,
    * keyed `column: rule`. Empty map = `\COPY` of this frame's CSV would
    * load cleanly. Runs as a single aggregate over the frame.
    */
  def violations(df: DataFrame, table: String): Map[String, Long] = {
    val target = StagingSchemas.all.getOrElse(table,
      throw new IllegalArgumentException(s"unknown staging table $table"))
    val engineCols = df.columns.filter(_.startsWith("_")).toSet
    val unknown = df.columns.filterNot(engineCols)
      .filterNot(c => target.fieldNames.contains(c))
    require(unknown.isEmpty,
      s"$table has no columns ${unknown.mkString(", ")} — \\COPY would reject the column list")
    val missingNotNull = target.fields
      .filter(f => !f.nullable && !df.columns.contains(f.name))
    require(missingNotNull.isEmpty,
      s"NOT NULL columns absent from the frame (COPY fills them with NULL): " +
        missingNotNull.map(_.name).mkString(", "))

    val checks = target.fields.filter(f => df.columns.contains(f.name))
      .flatMap { f =>
        val c = col(f.name)
        val dfType = df.schema(f.name).dataType
        val cell = isEmpty(c, dfType)
        val nn =
          if (!f.nullable) Seq(s"${f.name}: NOT NULL" -> cell)
          else Seq.empty
        val typed =
          if (dfType != StringType) Seq.empty // already typed: CSV-safe
          else if (StagingSchemas.jsonbColumns(f.name))
            Seq(s"${f.name}: jsonb" -> (!cell && try_parse_json(c).isNull))
          else f.dataType match {
            case DateType => Seq(s"${f.name}: date" ->
              (!cell && to_date(c, "yyyy-MM-dd").isNull))
            case BooleanType => Seq(s"${f.name}: boolean" ->
              (!cell && !lower(trim(c)).isin(pgBoolLiterals.toSeq: _*)))
            case LongType => Seq(s"${f.name}: bigint" ->
              // strict integer syntax (Postgres rejects '3.7' where a
              // non-ANSI cast would truncate it) + cast-null overflow check
              (!cell && (!trim(c).rlike("^[+-]?[0-9]+$") ||
                trim(c).cast("long").isNull)))
            case _ => Seq.empty // text target: any string loads
          }
        nn ++ typed
      }
    if (checks.isEmpty) Map.empty
    else {
      val aggs = checks.map { case (k, pred) =>
        sum(when(pred, 1L).otherwise(0L)).as(k)
      }
      val row = df.agg(aggs.head, scala.collection.immutable.ArraySeq.unsafeWrapArray(aggs.tail): _*).head()
      checks.indices
        .map(i => checks(i)._1 -> (if (row.isNullAt(i)) 0L else row.getLong(i)))
        .filter(_._2 > 0).toMap
    }
  }

  /** Throw (listing every violated rule and its row count) unless `df`
    * would `\COPY` cleanly into `table`. */
  def validate(df: DataFrame, table: String): Unit = {
    val v = violations(df, table)
    require(v.isEmpty, s"$table fails copy-time validation: " +
      v.toSeq.sorted.map { case (k, n) => s"$k ($n rows)" }.mkString("; "))
  }

  /** One `\COPY` statement in the reference's documented form
    * (README.md:53,73-78). */
  def copyStatement(table: String, cols: Seq[String], csvFile: String): String =
    s"""\\COPY $table (${cols.mkString(", ")}) FROM $csvFile DELIMITER ',' CSV HEADER"""

  /** The prepared-file → staging-table load map of the documented flow:
    * each entry is (csv file, staging table, \COPY column list)
    * (README.md:73-78; the contacts table itself comes from the
    * application's migrations, README.md:49-53). */
  val loads: Seq[(String, String, Seq[String])] = Seq(
    ("contacts.csv", "contacts", Seq("nhs_number", "first_name",
      "middle_names", "surname", "address", "postcode", "telephone",
      "mobile", "date_of_birth", "created_at", "updated_at",
      "gds_import_data")),
    ("original_triage_needs.csv", "tmp_original_triage_needs",
      Seq("nhs_number", "category", "name", "created_at", "updated_at",
        "completed_on")),
    ("original_triage_notes.csv", "tmp_original_triage_notes",
      Seq("nhs_number", "category", "body", "created_at", "updated_at",
        "import_data")),
    ("food_needs.csv", "tmp_identified_needs",
      Seq("nhs_number", "category", "name", "created_at", "updated_at",
        "completed_on", "supplemental_data", "user_id")),
    ("callback_needs.csv", "tmp_identified_needs",
      Seq("nhs_number", "category", "name", "created_at", "updated_at",
        "start_on")),
    ("remaining_needs.csv", "tmp_identified_needs",
      Seq("nhs_number", "category", "name", "created_at", "updated_at",
        "user_id")),
    ("contact_profile_updates.csv", "tmp_contact_profile_updates",
      Seq("nhs_number", "additional_info", "delivery_details",
        "dietary_details", "has_covid_symptoms")))

  /** The complete staging DDL + load script for the documented psql
    * deployment: feed to `psql --file` alongside the engine's prepared
    * CSVs. */
  def loadScript: String =
    StagingSchemas.allDdl + "\n\n" +
      loads.map { case (file, table, cols) =>
        copyStatement(table, cols, file)
      }.mkString("\n") + "\n"
}
