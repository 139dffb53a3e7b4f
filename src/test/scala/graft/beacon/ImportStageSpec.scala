package graft.beacon

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL import stage (J3-J5) as pure DataFrame jobs, tested on typed
  * staging fixtures per FIXTURES.md §3 — including contacts missing from
  * staging (and vice versa) to pin inner-join drops and COALESCE
  * keep-old-value behavior.
  */
class ImportStageSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def withOrd(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("_idx", monotonically_increasing_id())
      .withColumn("_ord", struct(lit(0).as("rank"), col("_idx").as("idx"),
        lit(0L).as("pos")))
      .drop("_idx")

  // contacts: 999 has no staged rows; staged 555 has no contact.
  private lazy val contacts = Seq(
    (10L, "111", "old info", null.asInstanceOf[String], "old diet", false),
    (20L, "222", null.asInstanceOf[String], "leave pkg", null.asInstanceOf[String], true),
    (30L, "999", "untouched", "untouched", "untouched", false)
  ).toDF("id", "nhs_number", "additional_info", "delivery_details",
    "dietary_details", "has_covid_symptoms")

  test("J3: identified needs resolve contact_id by inner join; unknown nhs dropped") {
    val tmp = Seq(
      ("111", "groceries and cooked meals", "n1", "2020-04-06", "2020-04-06",
        "2020-04-06", """{"food_service_type":"Grocery delivery"}""", 101L, null.asInstanceOf[String]),
      ("555", "other", "n2", "2020-04-07", "2020-04-07",
        null.asInstanceOf[String], null.asInstanceOf[String], 104L, null.asInstanceOf[String])
    ).toDF("nhs_number", "category", "name", "created_at", "updated_at",
      "completed_on", "supplemental_data", "user_id", "start_on")
    val out = ImportStage.importIdentifiedNeeds(contacts, tmp).collect()
    assert(out.length == 1) // 555 has no contact → dropped
    assert(out.head.getLong(0) == 10L)
    assert(out.head.getString(1) == "groceries and cooked meals")
  }

  test("J4: surrogate ids replace RETURNING; notes back-fill through need ids") {
    val tmpNeeds = withOrd(Seq(
      ("111", "phone triage", "need-a", "2020-04-06", "2020-04-06",
        "2020-04-06"),
      ("222", "phone triage", "need-b", "2020-04-07", "2020-04-07",
        null.asInstanceOf[String]),
      ("555", "phone triage", "need-c", "2020-04-08", "2020-04-08",
        null.asInstanceOf[String]) // no contact → dropped
    ).toDF("nhs_number", "category", "name", "created_at", "updated_at",
      "completed_on"))
    val tmpNotes = Seq(
      ("111", "phone_import", "body-1", "2020-04-06", "2020-04-06", "{}"),
      ("111", "phone_success", "body-2", "2020-04-06", "2020-04-06",
        null.asInstanceOf[String]),
      ("222", "phone_failure", "body-3", "2020-04-07", "2020-04-07",
        null.asInstanceOf[String]),
      ("555", "phone_import", "body-4", "2020-04-08", "2020-04-08", "{}")
    ).toDF("nhs_number", "category", "body", "created_at", "updated_at",
      "import_data")

    val (needs, notes) =
      ImportStage.importOriginalTriageNeedsAndNotes(contacts, tmpNeeds,
        tmpNotes, nextNeedId = 1000L)
    val needRows = needs.orderBy("id").collect()
    assert(needRows.map(_.getLong(0)).toSeq == Seq(1000L, 1001L))
    assert(needRows.map(_.getLong(1)).toSeq == Seq(10L, 20L)) // contact ids

    val noteRows = notes.orderBy("need_id", "body").collect()
    // 555's note dropped; 111's two notes attach to need 1000, 222's to 1001
    assert(noteRows.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1000L, "body-1"), (1000L, "body-2"), (1001L, "body-3")))
  }

  test("J5: COALESCE merge keeps old value when staged value is null") {
    val tmp = withOrd(Seq(
      ("111", "new info", null.asInstanceOf[String], null.asInstanceOf[String],
        Some(true)),
      ("222", null.asInstanceOf[String], null.asInstanceOf[String],
        "vegan", None)
    ).toDF("nhs_number", "additional_info", "delivery_details",
      "dietary_details", "has_covid_symptoms"))
    val merged = ImportStage.applyContactProfileUpdates(contacts, tmp)
      .orderBy("id").collect()
    val r111 = merged(0)
    assert(r111.getString(2) == "new info") // staged wins
    assert(r111.isNullAt(3)) // both null
    assert(r111.getString(4) == "old diet") // staged null → old kept
    assert(r111.getBoolean(5)) // staged true overrides false
    val r222 = merged(1)
    assert(r222.getString(3) == "leave pkg") // old kept
    assert(r222.getString(4) == "vegan") // staged wins
    assert(r222.getBoolean(5)) // staged None → old true kept
    val r999 = merged(2)
    assert(r999.getString(2) == "untouched") // no staged row at all
  }
}
