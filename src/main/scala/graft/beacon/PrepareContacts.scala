package graft.beacon

import graft.beacon.BeaconExprs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `prepare-contacts` pipeline (reference:
  * beacon/prepare_contacts.py:8-52): extract core contact fields from a
  * gds CSV and carry the original row as a serialized JSON column.
  *
  * Reference fidelity note: as shipped the reference crashes at plan
  * build (`partial` used but never imported, prepare_contacts.py:19 vs
  * :1-6); the unambiguous intent — serialize the original row keyed by
  * the source header — is implemented here (SURVEY.md §7.3.4).
  */
object PrepareContacts {

  val outputColumns: Seq[String] = Seq(
    "nhs_number", "first_name", "middle_names", "surname", "address",
    "postcode", "telephone", "mobile", "date_of_birth", "created_at",
    "updated_at", "gds_import_data")

  def fromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", true)
      .option("multiLine", true)
      .csv(path)

  /** Build the contacts table. `now` is a single driver-captured instant
    * (prepare_contacts.py:14) — deliberately NOT per-row
    * current_timestamp() (SURVEY.md §7.3.7). */
  def apply(gds: DataFrame,
      now: String = java.time.LocalDateTime.now().toString): DataFrame = {
    val header = gds.columns.toSeq
    val addressParts = Seq("Address1", "Address2", "Address3", "Address4",
      "Address5", "Postcode").map(col)
    gds
      .withColumn("_idx", monotonically_increasing_id())
      .withColumn("gds_import_data", serializeRow(header))
      .withColumn("created_at", lit(now))
      .withColumn("updated_at", lit(now))
      .withColumn("address", concatAddress(addressParts))
      .withColumnsRenamed(CallsHeaderMap.gdsRenameMap)
      .withColumn("date_of_birth", parseDate(col("date_of_birth")))
      .select(outputColumns.map(col) :+
        struct(lit(0).as("rank"), col("_idx").as("idx"),
          lit(0L).as("pos")).as("_ord"): _*)
  }
}
