package graft.beacon

import graft.SparkTestSession
import graft.beacon.BeaconExprs._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Fuzz the error-as-null guarantee (SURVEY.md §2.2 P5 / §7.3.2): every
  * parser in the scalar layer must map arbitrary garbage to null — never
  * throw — because petl's convert swallows per-value errors and the
  * downstream predicates depend on the resulting Nones.
  */
class ErrorAsNullFuzzSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val rng = new Random(42)
  private val garbage: Seq[String] = {
    val chars = "0123456789/.-ab YyNnPrioté "
    (1 to 400).map(_ => (0 until rng.nextInt(20))
      .map(_ => chars(rng.nextInt(chars.length))).mkString) ++
      Seq("", "99/99/9999", "31/02/2020", "0.0.0", "1/1/1", "...",
        "priority x", "Priority 99", "PRIORITY 5", "12.13.14.15",
        "yes no", "-1/-1/-1", "00/00/00", "1//2", null)
  }

  test("all scalar parsers map arbitrary garbage to null or a valid value") {
    val df = garbage.toDF("v").select(
      col("v"),
      parseDate(col("v")).as("d"),
      parseCallbackDate(col("v")).as("cb"),
      parseFoodPriority(col("v")).as("fp"),
      parseCovidSymptoms(col("v")).as("cv"),
      composeDietaryDetails(col("v")).as("dd"))
    // collecting forces evaluation of every branch — must not throw
    val rows = df.collect()
    assert(rows.length == garbage.length)
    rows.foreach { r =>
      Option(r.getAs[String]("fp")).foreach(fp =>
        assert(fp.length == 1 && fp.forall(_.isDigit), fp))
      // parsed dates, when non-null, round-trip as real dates
      Option(r.getDate(1)).foreach(d => assert(d.toString.length == 10))
      Option(r.getDate(2)).foreach(d => assert(d.toString.length == 10))
    }
  }

  test("parseCallbackDate maps two-digit years like Python %y (69-99 → 19xx)") {
    val inputs = Seq("01.01.70", "31.12.99", "05.06.69", "01.01.68",
      "15.03.20", "25/12/2020")
    val got = inputs.toDF("v")
      .select(col("v"), parseCallbackDate(col("v")).cast("string").as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("01.01.70") == "1970-01-01")
    assert(got("31.12.99") == "1999-12-31")
    assert(got("05.06.69") == "1969-06-05")
    assert(got("01.01.68") == "2068-01-01")
    assert(got("15.03.20") == "2020-03-15")
    assert(got("25/12/2020") == "2020-12-25")
  }

  test("explode-count function never yields negative or >3 counts") {
    val df = garbage.toDF("v")
      .select(callNoteCount(col("v")).as("n"))
    val ns = df.collect().map(_.getInt(0))
    assert(ns.forall(n => n >= 0 && n <= 3))
  }
}
