package graft.beacon

/** The calls-spreadsheet schema as data: canonical field name, messy
  * source header, and optional human label (None = excluded from composed
  * body text). Order matters — it drives the import_data JSON key order
  * and the composed-body line order.
  *
  * Reproduced as *data* (not code) from the reference's header map
  * (/root/reference/beacon/calls_header_map.py:1-124); original headers
  * are byte-exact including trailing spaces and typos (e.g. `Contact
  * Sucessful ` at calls_header_map.py:19) — they are domain values, never
  * trim them.
  */
object CallsHeaderMap {

  final case class Field(canonical: String, original: String, label: Option[String])

  val fields: Vector[Field] = Vector(
    Field("nhs_number", "NHSNUMBER", None),
    Field("is_consolidation_record", "15/04/20 consolidation record", None),
    Field("latest_attempt_date",
      "Contact attempted (date)  Format:  06/04/2020", None),
    Field("latest_attempt_time", "Time. Format:  12:40", None),
    Field("was_contact_made", "Contact Sucessful ", Some("Contact successful")),
    Field("outcome", "Outcome complete at the end of the call", Some("Outcome")),
    Field("support_already_getting",
      "If no support needed, what support are they getting and who is supporting them eg Govt food parcels/Age Uk/Other VCS, family member, friends, neighbours). If support need is likely to change eg resident would like a call back to check in with them - selec",
      Some("If no support needed, what support are they getting")),
    Field("food_priority", "Food Requirements Priority ",
      Some("Food requirements priority")),
    Field("book_weekly_food_delivery", "Book weekly food delivery  yes/no",
      Some("Book weekly food delivery")),
    Field("callback_date",
      "Date to call resident back.  Add date below - 6 days from today's date (avoid weekend dates) format: 12/04/20",
      Some("Date to call resident back")),
    Field("household_count",
      "how many people in household? Basic number and if relevant eg baby, children",
      Some("How many people in household")),
    Field("dietary_requirements",
      "Do you have any special dietary requirements and notes? Eg special requirements - allergies, standard, vegetarian, vegan, baby, religious - halal  ",
      Some("Special dietary requirements")),
    Field("food_notes_or_needs",
      "Additional food notes  or essential items needed",
      Some("Additional food notes or essential items needed")),
    Field("delivery_contact",
      "Delivery contact details if different? Eg if someone needs to let deliverer in. Contact name and number",
      Some("Delivery contact details")),
    Field("delivery_special_info",
      "Any special delivery information - any times you cannot do/access?  Eg how to get to block/house/intercome/doorbell doesn't work - times to avoid eg when taking medication",
      Some("Any special delivery information")),
    Field("has_covid_symptoms",
      "Are you or anyone in your home showing any symptoms of COVID-19?",
      Some("Are you or anyone in your home showing any symptoms of COVID-19?")),
    Field("addl_adult_social_care",
      "Additional Support: Adult Social Care.  Complete if you or resident have concerns and want follow up action.",
      Some("Additional support: Adult Social Care")),
    Field("addl_children_services",
      "Additional Support: Children Services Complete if you or resident have concerns and want follow up action.",
      Some("Additional support: Children Services")),
    Field("addl_safeguarding",
      "Additional Support: Safeguarding Complete if you or resident have concerns and want follow up action.",
      Some("Additional support: Safeguarding")),
    Field("addl_mental_wellbeing",
      "Additional Support: Mental Wellbeing Referral Complete if you or resident have concerns and want follow up action.",
      Some("Additional support: Mental wellbeing")),
    Field("addl_housing_waste",
      "Additional Support: Housing/ Waste Disposal. Complete if you or resident have concerns and want follow up action.",
      Some("Additional support: Housing/waste disposal")),
    Field("addl_medication_prescriptions",
      "Additional Support: Medication/ prescriptions. ",
      Some("Additional support: Medication/prescriptions")),
    Field("addl_medical_appt_transport",
      "Additional Support: Medical appointment Transport. ",
      Some("Additional support: Medical appointment transport")),
    Field("addl_financial",
      "Additional Support: Financial guidance/ information. Complete if you or resident have concerns and want follow up action.",
      Some("Additional support: Financial guidance/information")),
    Field("addl_shopping", "Additional Support: Additional Shopping needs",
      Some("Additional support: Additional shopping needs")),
    Field("addl_referrals",
      "Additional Support: Other referrals (eg concerns for neighbour/friend)",
      Some("Additional support: Other referrals (eg concerns for neighbour/friend)")),
    Field("addl_misc_other1", "Additional Support: Miscellaneous Other",
      Some("Additional support: Miscellaneous other")),
    Field("addl_misc_other2", "Additional Support: Miscellaneous Other2",
      Some("Additional support: Miscellaneous other 2")),
    Field("notes",
      "Notes: Please add any helpful information from resident here",
      Some("Notes")),
    Field("was_told_about_support_line",
      "Have you told resident about the 24/7 Camden Council Covid 19 support line and website?                         Call:  020 7974 4444 extension 9  and www.camden.gov.uk/covid-19",
      Some("Told resident about support line and website"))
  )

  /** original header → canonical name (the bulk-rename map, P1). */
  val renameMap: Map[String, String] =
    fields.map(f => f.original -> f.canonical).toMap

  /** Canonical names in declaration order (import_data JSON key order). */
  val canonicalOrder: Vector[String] = fields.map(_.canonical)

  /** (canonical, label) pairs for fields that contribute composed-body
    * lines, in declaration order. */
  val labeledFields: Vector[(String, String)] =
    fields.collect { case Field(c, _, Some(l)) => c -> l }

  /** gds.csv rename map (prepare_contacts.py:23-30). */
  val gdsRenameMap: Map[String, String] = Map(
    "NHSNumber" -> "nhs_number",
    "FirstName" -> "first_name",
    "MiddleName" -> "middle_names",
    "LastName" -> "surname",
    "Postcode" -> "postcode",
    "DOB" -> "date_of_birth",
    "Phone" -> "telephone",
    "Mobile" -> "mobile")
}
