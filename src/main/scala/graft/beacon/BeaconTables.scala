package graft.beacon

import java.sql.Date

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Typed views of the final beacon tables (SURVEY.md §1.2: typed
  * wrappers are the idiom where compile-time field checks help — the
  * staging handoff). The pipelines stay DataFrame-based (dynamic,
  * header-driven schemas); these case classes give downstream consumers
  * a `Dataset[T]` surface.
  */
object BeaconTables {

  final case class TriageNeed(
      nhs_number: String, category: String, name: String,
      created_at: Date, updated_at: Date, completed_on: Option[Date])

  final case class IdentifiedNeed(
      nhs_number: String, category: String, name: String,
      created_at: Date, updated_at: Date, completed_on: Option[Date],
      supplemental_data: Option[String], user_id: Option[Long],
      start_on: Option[Date])

  final case class ContactProfileUpdate(
      nhs_number: String, additional_info: Option[String],
      delivery_details: Option[String], dietary_details: Option[String],
      has_covid_symptoms: Option[Boolean])

  /** Typed view of prepare-calls outputs (drops engine columns). */
  def triageNeeds(outputs: PrepareCalls.Outputs): Dataset[TriageNeed] = {
    implicit val enc: Encoder[TriageNeed] = Encoders.product[TriageNeed]
    outputs.originalTriageNeeds.drop("_ord").as[TriageNeed]
  }

  def foodNeeds(outputs: PrepareCalls.Outputs): Dataset[IdentifiedNeed] = {
    implicit val enc: Encoder[IdentifiedNeed] = Encoders.product[IdentifiedNeed]
    outputs.foodNeeds.drop("_ord")
      .withColumn("start_on",
        org.apache.spark.sql.functions.lit(null).cast("date"))
      .as[IdentifiedNeed]
  }

  def profileUpdates(outputs: PrepareCalls.Outputs): Dataset[ContactProfileUpdate] = {
    implicit val enc: Encoder[ContactProfileUpdate] =
      Encoders.product[ContactProfileUpdate]
    outputs.contactProfileUpdates.drop("_ord").as[ContactProfileUpdate]
  }
}
