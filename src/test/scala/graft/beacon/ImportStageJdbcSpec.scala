package graft.beacon

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S5 end-to-end: the staging tables travel through a real JDBC
  * database (embedded Derby, in-memory), the import-stage jobs run on
  * the read-back frames, and the results write back over JDBC — the
  * engine equivalent of the reference's psql \COPY + in-database import
  * SQL (README.md:53,73-78). Results must equal the in-engine run.
  */
class ImportStageJdbcSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  System.setProperty("derby.stream.error.file",
    s"${System.getProperty("java.io.tmpdir")}/derby.log")

  private def withOrd(df: DataFrame) =
    df.withColumn("_idx", monotonically_increasing_id())
      .withColumn("_ord", struct(lit(0).as("rank"), col("_idx").as("idx"),
        lit(0L).as("pos")))
      .drop("_idx")

  private lazy val contacts = Seq(
    (10L, "111", "old info", null.asInstanceOf[String], "old diet", false),
    (20L, "222", null.asInstanceOf[String], "leave pkg", null.asInstanceOf[String], true),
    (30L, "999", "untouched", "untouched", "untouched", false)
  ).toDF("id", "nhs_number", "additional_info", "delivery_details",
    "dietary_details", "has_covid_symptoms")

  private lazy val tmpNeeds = withOrd(Seq(
    ("111", "phone triage", "need-a", "2020-04-06", "2020-04-06", "2020-04-06"),
    ("222", "phone triage", "need-b", "2020-04-07", "2020-04-07", null.asInstanceOf[String]),
    ("555", "phone triage", "need-c", "2020-04-08", "2020-04-08", null.asInstanceOf[String])
  ).toDF("nhs_number", "category", "name", "created_at", "updated_at",
    "completed_on"))

  private lazy val tmpNotes = Seq(
    ("111", "phone_import", "body-1", "2020-04-06", "2020-04-06", "{}"),
    ("111", "phone_success", "body-2", "2020-04-06", "2020-04-06", null.asInstanceOf[String]),
    ("222", "phone_failure", "body-3", "2020-04-07", "2020-04-07", null.asInstanceOf[String]),
    ("555", "phone_import", "body-4", "2020-04-08", "2020-04-08", "{}")
  ).toDF("nhs_number", "category", "body", "created_at", "updated_at",
    "import_data")

  private lazy val tmpUpdates = withOrd(Seq(
    ("111", "new info", null.asInstanceOf[String], null.asInstanceOf[String], Some(true)),
    ("222", null.asInstanceOf[String], null.asInstanceOf[String], "vegan", None)
  ).toDF("nhs_number", "additional_info", "delivery_details",
    "dietary_details", "has_covid_symptoms"))

  private def rows(df: DataFrame, sortCols: String*): Seq[String] =
    df.orderBy(sortCols.map(col): _*)
      .collect().map(_.mkString("|")).toSeq

  test("staging tables survive the JDBC round-trip including _ord structs") {
    JdbcStaging.write(tmpNeeds, url, "tmp_original_triage_needs")
    val back = JdbcStaging.read(spark, url, "tmp_original_triage_needs")
    // same field names and types (JDBC legitimately adds nullability +
    // driver metadata)
    def shape(df: DataFrame) = df.schema("_ord").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(back) == shape(tmpNeeds))
    assert(rows(back, "nhs_number") == rows(tmpNeeds, "nhs_number"))
  }

  test("import stage over JDBC-read staging == in-engine import stage") {
    for ((name, df) <- Seq(
        "contacts" -> contacts,
        "tmp_original_triage_needs" -> tmpNeeds,
        "tmp_original_triage_notes" -> tmpNotes,
        "tmp_contact_profile_updates" -> tmpUpdates))
      JdbcStaging.write(df, url, name)

    val jContacts = JdbcStaging.read(spark, url, "contacts")
    val jNeeds = JdbcStaging.read(spark, url, "tmp_original_triage_needs")
    val jNotes = JdbcStaging.read(spark, url, "tmp_original_triage_notes")
    val jUpdates = JdbcStaging.read(spark, url, "tmp_contact_profile_updates")

    val (needsJ, notesJ) = ImportStage.importOriginalTriageNeedsAndNotes(
      jContacts, jNeeds, jNotes, nextNeedId = 1000L)
    val (needsL, notesL) = ImportStage.importOriginalTriageNeedsAndNotes(
      contacts, tmpNeeds, tmpNotes, nextNeedId = 1000L)
    assert(rows(needsJ, "id") == rows(needsL, "id"))
    assert(rows(notesJ, "need_id", "body") == rows(notesL, "need_id", "body"))

    val mergedJ = ImportStage.applyContactProfileUpdates(jContacts, jUpdates)
    val mergedL = ImportStage.applyContactProfileUpdates(contacts, tmpUpdates)
    assert(rows(mergedJ, "id") == rows(mergedL, "id"))

    // write results back over JDBC (the INSERT leg) and read them again
    JdbcStaging.write(needsJ, url, "needs")
    val needsBack = JdbcStaging.read(spark, url, "needs")
    assert(rows(needsBack, "id") == rows(needsL, "id"))
  }
}
