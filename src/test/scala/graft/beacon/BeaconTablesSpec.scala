package graft.beacon

import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BeaconTablesSpec extends AnyFunSuite with SparkTestSession {

  private lazy val outputs = {
    val dir = Files.createTempDirectory("typed-fixture-")
    PrepareCalls(
      PrepareCalls.fromCsv(spark, CallsFixture.writeCallsCsv(dir).toString),
      PrepareCalls.Users(101L, 102L, 103L, 104L))
  }

  test("typed Dataset views decode every output row") {
    val needs = BeaconTables.triageNeeds(outputs).collect()
    assert(needs.length == 9)
    assert(needs.count(_.completed_on.isDefined) == 5)
    assert(needs.forall(_.category == "phone triage"))

    val food = BeaconTables.foodNeeds(outputs).collect()
    assert(food.length == 3)
    assert(food.forall(_.user_id.contains(101L)))
    assert(food.forall(_.supplemental_data.exists(_.contains("Grocery delivery"))))

    val prof = BeaconTables.profileUpdates(outputs).collect()
    assert(prof.length == 9)
    assert(prof.count(_.has_covid_symptoms.contains(true)) == 1)
  }
}
