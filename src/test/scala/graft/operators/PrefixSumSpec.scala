package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class PrefixSumSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("running total equals a sequential scan, across partitions") {
    val rnd = new Random(11)
    val rows = (1L to 5000L).map(i => (i, rnd.nextInt(100).toLong))
    val expected = rows.scanLeft((0L, 0L)) { case ((_, acc), (id, v)) =>
      (id, acc + v)
    }.drop(1).toMap
    val got = PrefixSum
      .withRunningTotal(rows.toDF("id", "v"), "id", "v", "cum",
        numPartitions = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("null values count as zero and order is by the order column") {
    val df = Seq((3L, Some(5L)), (1L, None), (2L, Some(2L)))
      .toDF("id", "v")
    val got = PrefixSum.withRunningTotal(df, "id", "v", "cum")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((1L, 0L), (2L, 2L), (3L, 7L)))
  }

  test("pre-stamp stage range-partitions; no single-partition funnel") {
    val df = spark.range(10000).toDF("id")
      .withColumn("v", (col("id") % 7).cast("long"))
    // the sorted pre-stamp plan is where distribution is decided (the
    // stamped result is a narrow pass over it)
    val plan = SequentialIds.rangeSorted(df, "id", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), plan)
    assert(!plan.contains("Window"), plan)
    // and the stamped output really has the requested distribution
    val stamped = PrefixSum.withRunningTotal(df, "id", "v", "cum", 8)
    assert(stamped.rdd.getNumPartitions == 8)
  }

  test("non-long value column is rejected") {
    val df = Seq((1L, "x")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotal(df, "id", "v", "cum")
    }
  }
}
