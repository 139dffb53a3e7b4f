package graft.beacon

import java.nio.charset.Charset
import java.nio.file.{Files, Path}

import graft.beacon.CallsHeaderMap.{canonicalOrder, fields}

/** Synthetic calls.csv / gds.csv fixtures per FIXTURES.md §1-2: original
  * messy headers byte-exact (trailing spaces, typos), windows-1252
  * encoding, quoted embedded newlines, every value-domain class the
  * reference's functions branch on.
  */
object CallsFixture {

  /** Minimal CSV writer with standard quoting (petl/csv-module dialect). */
  def toCsv(rows: Seq[Seq[String]]): String =
    rows.map(_.map { cell =>
      if (cell.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + cell.replace("\"", "\"\"") + "\""
      else cell
    }.mkString(",")).mkString("\n") + "\n"

  /** The canonical→value maps for the fixture rows (unset fields = ""). */
  val rows: Seq[Map[String, String]] = Seq(
    // r0: successful food-referral call, priority 1 (completed food need)
    Map("nhs_number" -> "111", "latest_attempt_date" -> "06/04/2020",
      "was_contact_made" -> "Yes", "outcome" -> "Food referral ",
      "food_priority" -> "Priority 1", "household_count" -> "3 (1 baby)",
      "dietary_requirements" -> "No", "has_covid_symptoms" -> "Yes",
      "notes" -> "likes calls"),
    // r1: three failed attempts (completed triage + 3 failure notes)
    Map("nhs_number" -> "222", "latest_attempt_date" -> "07/04/2020",
      "was_contact_made" -> "No 3 attempts made"),
    // r2: unrecognized was_contact_made (0 notes), dotted callback date,
    // windows-1252 é in notes
    Map("nhs_number" -> "333", "latest_attempt_date" -> "08/04/2020",
      "was_contact_made" -> "Unknown", "callback_date" -> "12.04.20",
      "dietary_requirements" -> "vegetarian",
      "has_covid_symptoms" -> "No", "notes" -> "café visits"),
    // r3: empty attempt date → dropped by the base filter
    Map("nhs_number" -> "444", "latest_attempt_date" -> "",
      "was_contact_made" -> "Yes"),
    // r4: duplicate nhs 111 (first-match lookups), voicemail ×2,
    // open priority-3 food need
    Map("nhs_number" -> "111", "latest_attempt_date" -> "09/04/2020",
      "was_contact_made" -> "No 2 attempts made",
      "outcome" -> "Left voicemail", "food_priority" -> "Priority 3"),
    // r5: one failed attempt, 'Call back ' outcome, prescription need
    Map("nhs_number" -> "555", "latest_attempt_date" -> "10/04/2020",
      "was_contact_made" -> "No -1 attempt made", "outcome" -> "Call back ",
      "addl_medication_prescriptions" -> "insulin"),
    // r6: invalid numbers, Other referral → review-user other need
    Map("nhs_number" -> "666", "latest_attempt_date" -> "11/04/2020",
      "was_contact_made" -> "Invalid phone numbers",
      "outcome" -> "Other referral"),
    // r7: food+other referral, complex concern, covid Unsure → null
    Map("nhs_number" -> "777", "latest_attempt_date" -> "12/04/2020",
      "was_contact_made" -> "Yes", "outcome" -> "Food and Other referral",
      "addl_adult_social_care" -> "concern",
      "has_covid_symptoms" -> "Unsure"),
    // r8: slash callback date, simple+complex-class needs, embedded
    // newline in quoted notes
    Map("nhs_number" -> "888", "latest_attempt_date" -> "13/04/2020",
      "was_contact_made" -> "Yes", "callback_date" -> "14/04/2020",
      "addl_housing_waste" -> "bins", "addl_mental_wellbeing" -> "anxious",
      "addl_financial" -> "debt", "notes" -> "line one\nline two"),
    // r9: garbage callback date → parse null, no callback need
    Map("nhs_number" -> "999", "latest_attempt_date" -> "14/04/2020",
      "was_contact_made" -> "Yes", "callback_date" -> "next tuesday"))

  /** nhs_numbers of base rows in file order (r3 dropped). */
  val baseNhsOrder: Seq[String] =
    Seq("111", "222", "333", "111", "555", "666", "777", "888", "999")

  def writeCallsCsv(dir: Path): Path = {
    val header = fields.map(_.original)
    val data = rows.map(r => canonicalOrder.map(c => r.getOrElse(c, "")))
    val p = dir.resolve("calls.csv")
    Files.write(p, toCsv(header +: data).getBytes(Charset.forName("windows-1252")))
    p
  }

  val gdsHeader: Seq[String] = Seq("NHSNumber", "FirstName", "MiddleName",
    "LastName", "Address1", "Address2", "Address3", "Address4", "Address5",
    "Postcode", "DOB", "Phone", "Mobile")

  val gdsRows: Seq[Seq[String]] = Seq(
    Seq("111", "Joan", "M", "Smith", "Flat 2", "10 High St", "", "", "",
      "NW1 2AB", "31/01/1980", "020 7946 0000", "07700 900000"),
    Seq("222", "Ali", "", "Khan", "1 Low Rd", "", "Camden", "", "",
      "NW1 9ZZ", "29/02/2001", "", "07700 900001"), // invalid date → null
    Seq("333", "Ana", "", "Diaz", "", "", "", "", "", "", "05/06/1955",
      "020 7946 0001", ""))

  def writeGdsCsv(dir: Path): Path = {
    val p = dir.resolve("gds.csv")
    Files.write(p, toCsv(gdsHeader +: gdsRows).getBytes("UTF-8"))
    p
  }
}
