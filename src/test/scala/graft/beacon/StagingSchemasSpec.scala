package graft.beacon

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class StagingSchemasSpec extends AnyFunSuite with SparkTestSession {

  test("pipeline outputs conform to the staging schemas (types + names)") {
    val dir = java.nio.file.Files.createTempDirectory("staging-fixture-")
    val calls = CallsFixture.writeCallsCsv(dir)
    val outputs = PrepareCalls(
      PrepareCalls.fromCsv(spark, calls.toString),
      PrepareCalls.Users(101L, 102L, 103L, 104L))

    def conforms(df: org.apache.spark.sql.DataFrame,
        schema: org.apache.spark.sql.types.StructType,
        subset: Boolean = false): Unit = {
      val out = df.drop("_ord").schema.fields.map(f => f.name -> f.dataType).toMap
      val expected = schema.fields.map(f => f.name -> f.dataType).toMap
      val keys = if (subset) out.keySet else expected.keySet
      keys.foreach { k =>
        assert(out.contains(k), s"missing column $k")
        assert(out(k) == expected(k), s"$k: ${out.get(k)} vs ${expected(k)}")
      }
    }

    conforms(outputs.originalTriageNeeds, StagingSchemas.tmpOriginalTriageNeeds)
    conforms(outputs.originalTriageNotes, StagingSchemas.tmpOriginalTriageNotes)
    conforms(outputs.contactProfileUpdates,
      StagingSchemas.tmpContactProfileUpdates)
    // food/callback/remaining each load a column subset of
    // tmp_identified_needs (README.md:75-77)
    conforms(outputs.foodNeeds, StagingSchemas.tmpIdentifiedNeeds, subset = true)
    conforms(outputs.callbackNeeds, StagingSchemas.tmpIdentifiedNeeds, subset = true)
    conforms(outputs.remainingNeeds, StagingSchemas.tmpIdentifiedNeeds, subset = true)
  }

  test("DDL generator reproduces the reference's staging DDL shape") {
    val ddl = StagingSchemas.ddl("tmp_identified_needs")
    assert(ddl.contains("nhs_number text NOT NULL"))
    assert(ddl.contains("supplemental_data jsonb"))
    assert(ddl.contains("user_id bigint"))
    assert(ddl.contains("start_on date"))
    assert(StagingSchemas.allDdl.split("CREATE TABLE").length == 5)
  }
}
