package graft.beacon

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The scalar-function layer of the beacon pipelines (SURVEY.md §2.6,
  * C1–C26), expressed as pure Column combinators — every one is a
  * Catalyst-optimizable expression tree (no UDFs), so the whole pipeline
  * stays inside whole-stage codegen.
  *
  * Error-as-null dialect: the reference's petl `convert` swallows
  * per-value errors into None (prepare_calls.py via petl 1.3 defaults;
  * SURVEY.md §2.2 P5). Spark's to_date/regexp_extract return null/"" on
  * mismatch natively, which these combinators rely on — sessions must run
  * with ANSI off (Tables.pinDialect).
  *
  * Null-vs-empty: Spark's CSV reader yields null for empty cells where
  * petl yields "". Both are falsy to every predicate here, and both write
  * back as an empty CSV cell, so the observable behavior matches.
  */
object BeaconExprs {

  // Import-annotation messages (prepare_calls.py:13-18).
  val MsgOriginalTriageNeed = "[Import]: Imported from call log spreadsheet"
  val MsgCallLogNote = "[Import]: Imported call log"
  val MsgGenericNeed =
    "[Import]: Need created automatically from imported call log"
  val MsgCallbackNeed =
    "[Import]: Callback need created automatically because the imported call log had a food need or callback date specified"
  val MsgClosedFoodNeed =
    "[Import]: Marked completed because priority 1 and 2 food needs were all met by the time the call log was imported"
  val MsgOtherNeed =
    "[Import]: Need created automatically because the imported call log had an \"Other referral\" or filled in \"Additional support\""

  /** petl row-truthiness for a string cell: non-null and non-empty (F1). */
  def truthy(c: Column): Column = c.isNotNull && c =!= ""

  /** C2: strict dd/MM/yyyy → DateType, null on mismatch
    * (helpers.py:8-11 + convert error-swallow). */
  def parseDate(c: Column): Column = to_date(c, "dd/MM/yyyy")

  /** C1-shape: serialize the given columns as a JSON object keyed by
    * their canonical names, in order (helpers.py:4-5). Divergence from
    * petl noted: json.dumps uses `", "`/`": "` separators and keeps empty
    * strings; to_json is compact and would drop nulls — so empty cells
    * are restored to "" first, keeping all keys present. */
  def serializeRow(keys: Seq[String]): Column =
    to_json(struct(keys.map(k => coalesce(col(k), lit("")).as(k)): _*))

  /** C1 byte-fidelity variant: serialize exactly like Python's
    * json.dumps — `", "` / `": "` separators, non-ASCII escaped as
    * \\uXXXX — for byte-identical goldens against petl output
    * (SURVEY.md §7.3.3). Opt-in; the pipelines default to the
    * Catalyst-native [[serializeRow]] (compact separators, same parsed
    * value). Implemented as a tiny UDF because separator control is not
    * expressible with to_json.
    */
  def serializeRowPetlStyle(keys: Seq[String]): Column = {
    val serialize = udf { values: Seq[String] =>
      def esc(s: String): String = {
        val b = new StringBuilder
        s.foreach {
          case '"' => b.append("\\\"")
          case '\\' => b.append("\\\\")
          case '\n' => b.append("\\n")
          case '\r' => b.append("\\r")
          case '\t' => b.append("\\t")
          case c if c < ' ' || c > '~' => b.append(f"\\u${c.toInt}%04x")
          case c => b.append(c)
        }
        b.toString
      }
      keys.zip(values).map { case (k, v) =>
        "\"" + esc(k) + "\": \"" + esc(Option(v).getOrElse("")) + "\""
      }.mkString("{", ", ", "}")
    }
    serialize(array(keys.map(k => coalesce(col(k), lit(""))): _*))
  }

  /** C4 compose_body (prepare_calls.py:193-201): one "label: value" line
    * per labeled field with a non-blank value, in header-map order,
    * joined with \n after the prefix lines. `prefixes` entries may be
    * conditional (null prefixes are skipped by concat_ws). */
  def composeBody(prefixes: Seq[Column],
      fields: Seq[(String, String)] = CallsHeaderMap.labeledFields): Column = {
    val lines = fields.map { case (key, label) =>
      when(truthy(col(key)) && trim(col(key)) =!= "",
        concat(lit(label + ": "), trim(col(key))))
    }
    concat_ws("\n", prefixes ++ lines: _*)
  }

  /** C5/C6/C7: compose_body with a constant prefix message. */
  def composeWithPrefix(msg: String): Column = composeBody(Seq(lit(msg)))

  /** C8 compose_food_need_desc: generic prefix, plus the closed-food
    * message when completed_on is set (reads the previously-derived
    * completed_on column — field order matters, prepare_calls.py:76-78). */
  def composeFoodNeedDesc(completedOn: Column): Column =
    composeBody(Seq(
      lit(MsgGenericNeed),
      when(completedOn.isNotNull, lit(MsgClosedFoodNeed))))

  /** C9 compose_additional_info: restricted to household_count + notes.
    * Reference fidelity: the code plucks ['household_count',
    * 'support_already_geting', 'notes'] where the middle key is a typo
    * (prepare_calls.py:221 vs header key `support_already_getting`), so
    * petl silently drops it — reproduced here. */
  def composeAdditionalInfo: Column =
    composeBody(Nil, CallsHeaderMap.labeledFields.filter {
      case (k, _) => k == "household_count" || k == "notes"
    })

  /** C10 compose_delivery_details. */
  def composeDeliveryDetails: Column =
    composeBody(Nil, CallsHeaderMap.labeledFields.filter {
      case (k, _) => k == "delivery_contact" || k == "delivery_special_info"
    })

  /** C11 compose_dietary_details: pass through unless it lower/strips to
    * 'no' (prepare_calls.py:228-230). Null input stays null (petl: empty
    * string stays "" — both write as an empty cell). */
  def composeDietaryDetails(c: Column): Column =
    when(lower(trim(c)) =!= "no" || c.isNull, c)

  /** C12 determine_triage_completion (prepare_calls.py:235-237). */
  def triageCompletion(wasContactMade: Column, latestAttempt: Column): Column =
    when(lower(wasContactMade).isin("yes", "no 3 attempts made"),
      latestAttempt)

  /** C13 parse_covid_symptoms: yes→true, no→false, else null
    * (prepare_calls.py:239-246). */
  def parseCovidSymptoms(c: Column): Column =
    when(lower(trim(c)) === "yes", true)
      .when(lower(trim(c)) === "no", false)

  /** C15 parse_food_priority: regex `priority (\d)` (case-insensitive),
    * null on no match — regexp_extract yields "" on miss, mapped to null
    * to mirror petl's convert error-swallow (prepare_calls.py:276-278). */
  def parseFoodPriority(c: Column): Column = {
    val ex = regexp_extract(c, "(?i)priority (\\d)", 1)
    when(ex =!= "", ex)
  }

  /** C16 determine_food_completion (prepare_calls.py:280-281). */
  def foodCompletion(foodPriority: Column, latestAttempt: Column): Column =
    when(foodPriority.isin("1", "2"), latestAttempt)

  /** C17 construct_supplemental_data (prepare_calls.py:283-290): JSON
    * with food_service_type always, food_priority when set (key order =
    * insertion order, matched by struct field order). */
  def supplementalData(foodPriority: Column): Column =
    when(truthy(foodPriority),
      to_json(struct(
        lit("Grocery delivery").as("food_service_type"),
        foodPriority.as("food_priority"))))
      .otherwise(to_json(struct(
        lit("Grocery delivery").as("food_service_type"))))

  /** C18 parse_callback_date: extract the first date-like token, then try
    * dd/MM/yyyy and dd.MM.yy (prepare_calls.py:292-306). Python %y maps
    * 69-99→19xx while Spark's yy maps everything to 20xx, so two-digit
    * years ≥ 2069 are shifted back a century to match strptime exactly
    * (leap-year parity holds for 1969-1999 vs 2069-2099, so the -1200
    * month shift never clamps a day). */
  def parseCallbackDate(c: Column): Column = {
    val ex = regexp_extract(c, "(\\d+[/\\.]\\d+[/\\.]\\d+)", 1)
    val dotted = to_date(ex, "dd.MM.yy")
    val pyY = when(year(dotted) >= 2069, add_months(dotted, -1200))
      .otherwise(dotted)
    coalesce(to_date(ex, "dd/MM/yyyy"), pyY)
  }

  /** F3 needs_food: outcome match (trailing spaces are source-data
    * values, prepare_calls.py:308-311) or raw food_priority truthy. */
  def needsFood(outcome: Column, rawFoodPriority: Column): Column =
    outcome.isin("Food referral ", "Food and Other referral") ||
      truthy(rawFoodPriority)

  /** F4 needs_callback: parsed callback_date, food need, the reference's
    * dead `book_weekly_food_delivery == True` clause (a str never equals
    * True — reproduced as literal false, prepare_calls.py:316), or
    * 'Call back ' outcome. */
  def needsCallback(callbackDate: Column, outcome: Column,
      rawFoodPriority: Column): Column =
    callbackDate.isNotNull || needsFood(outcome, rawFoodPriority) ||
      lit(false) || outcome === "Call back "

  /** F6 has_complex_other_need (prepare_calls.py:325-328). */
  def hasComplexOtherNeed: Column =
    truthy(col("addl_adult_social_care")) ||
      truthy(col("addl_children_services")) ||
      truthy(col("addl_safeguarding"))

  /** F7 has_simple_other_need (prepare_calls.py:330-333). */
  def hasSimpleOtherNeed: Column =
    truthy(col("addl_housing_waste")) ||
      truthy(col("addl_medical_appt_transport")) ||
      truthy(col("addl_referrals"))

  /** F8 has_value_in_misc_fields (prepare_calls.py:335-336). */
  def hasMiscOtherNeed: Column =
    truthy(col("addl_misc_other1")) || truthy(col("addl_misc_other2"))

  /** F5 needs_other_support (prepare_calls.py:319-323). */
  def needsOtherSupport(outcome: Column): Column =
    outcome.isin("Other referral", "Food and Other referral") ||
      hasComplexOtherNeed || hasSimpleOtherNeed || hasMiscOtherNeed

  /** C19 determine_callback_start_date: parsed callback date, else
    * latest attempt + 6 days (prepare_calls.py:338-340). */
  def callbackStartDate(callbackDate: Column, latestAttempt: Column): Column =
    coalesce(callbackDate, date_add(latestAttempt, 6))

  /** C20 determine_other_need_user (prepare_calls.py:342-348). */
  def otherNeedUser(complexUser: Long, simpleUser: Long,
      reviewUser: Long): Column =
    when(hasComplexOtherNeed, complexUser)
      .when(hasSimpleOtherNeed, simpleUser)
      .otherwise(reviewUser)

  /** C14/U1 generate_call_notes category + repeat count
    * (prepare_calls.py:248-274): unmatched was_contact_made values yield
    * count 0 → the row vanishes at explode, mirroring petl's silent
    * row-skip on the unbound-variable error. */
  def callNoteCategory(wasContactMade: Column, outcome: Column): Column = {
    val w = lower(wasContactMade)
    val failureCat =
      when(outcome === "Left voicemail", "phone_message")
        .otherwise("phone_failure")
    when(w === "yes", "phone_success").otherwise(failureCat)
  }

  def callNoteCount(wasContactMade: Column): Column = {
    val w = lower(wasContactMade)
    when(w === "yes", 1)
      .when(w === "no -1 attempt made" || w === "invalid phone numbers", 1)
      .when(w === "no 2 attempts made", 2)
      .when(w === "no 3 attempts made", 3)
      .otherwise(0)
  }

  /** C3 concat_address (prepare_contacts.py:47-52): join non-empty parts
    * with ", " — concat_ws skips nulls but not empty strings, hence the
    * higher-order filter. */
  def concatAddress(parts: Seq[Column]): Column =
    concat_ws(", ", filter(array(parts.map(p => coalesce(p, lit(""))): _*),
      x => x =!= ""))
}
