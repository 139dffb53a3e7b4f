package graft.beacon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's Postgres import stage (the three sql scripts; SURVEY.md §2.4
  * J3-J5) as DataFrame jobs against in-engine target tables. Each
  * function is pure: it takes the current target table(s) + staging
  * table(s) and returns the new state, so the stage composes and tests
  * without a database. A JDBC deployment would push the same plans
  * through `df.write.format("jdbc")`.
  */
object ImportStage {

  /** J3 (sql/import_identified_needs.sql): resolve contact_id by inner
    * equi-join on nhs_number and append to needs. contacts is the small
    * side → broadcast. */
  def importIdentifiedNeeds(contacts: DataFrame, tmpNeeds: DataFrame): DataFrame = {
    val contactsMap = contacts
      .select(col("id").as("contact_id"), col("nhs_number"))
    tmpNeeds
      .join(broadcast(contactsMap), Seq("nhs_number"), "inner")
      .select(col("contact_id"), col("category"), col("name"),
        col("created_at"), col("updated_at"), col("completed_on"),
        col("supplemental_data"), col("user_id"), col("start_on"))
  }

  /** J4 (sql/import_original_triage_needs_and_notes.sql): insert triage
    * needs with generated surrogate ids, then back-fill notes through the
    * fresh need ids — the Postgres `RETURNING` dance replaced by
    * deterministic sequential ids in staging (`_ord`) order
    * (SURVEY.md §7.3.6).
    *
    * @param nextNeedId first id to assign (e.g. 1 + max(needs.id))
    * @return (insertedNeeds with id+contact_id, insertedNotes with need_id)
    *
    * Id assignment is [[graft.operators.SequentialIds]] — per-partition
    * offsets over a range exchange, never a single-task global window.
    */
  def importOriginalTriageNeedsAndNotes(
      contacts: DataFrame,
      tmpNeeds: DataFrame,
      tmpNotes: DataFrame,
      nextNeedId: Long): (DataFrame, DataFrame) = {
    val contactsMap = contacts
      .select(col("id").as("contact_id"), col("nhs_number"))

    val insertedNeeds = graft.operators.SequentialIds.assign(
        tmpNeeds.join(broadcast(contactsMap), Seq("nhs_number"), "inner"),
        orderCol = "_ord", idCol = "id", first = nextNeedId)
      .select(col("id"), col("contact_id"), col("category"), col("name"),
        col("created_at"), col("updated_at"), col("completed_on"),
        col("_ord"))

    // The reference joins notes ⋈ contacts_map ⋈ inserted_needs on
    // nhs_number → contact_id — a many-to-many if a contact has several
    // triage needs, exactly as the SQL behaves (:35-39).
    val insertedNotes = tmpNotes
      .join(broadcast(contactsMap), Seq("nhs_number"), "inner")
      .join(broadcast(insertedNeeds.select(col("id").as("need_id"),
        col("contact_id"))), Seq("contact_id"), "inner")
      .select(col("need_id"), col("category"), col("body"),
        col("created_at"), col("updated_at"), col("import_data"))

    (insertedNeeds.drop("_ord"), insertedNotes)
  }

  /** J5 (sql/import_contact_profile_updates.sql): COALESCE merge — keep
    * the old value when the staged value is null. Left join preserves
    * contacts without updates; duplicate staged rows per nhs_number are
    * first-match-deduped to keep the update deterministic. */
  def applyContactProfileUpdates(contacts: DataFrame,
      tmpUpdates: DataFrame): DataFrame = {
    val mergeCols = Seq("additional_info", "delivery_details",
      "dietary_details", "has_covid_symptoms")
    val w = Window.partitionBy(col("nhs_number")).orderBy(col("_ord"))
    val updates = tmpUpdates
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("nhs_number") +:
        mergeCols.map(c => col(c).as(s"_upd_$c")): _*)
    val passThrough = contacts.columns.filterNot(mergeCols.contains)
    contacts
      .join(broadcast(updates), Seq("nhs_number"), "left")
      .select(passThrough.map(col).toSeq ++
        mergeCols.map(c => coalesce(col(s"_upd_$c"), col(c)).as(c)): _*)
  }
}
