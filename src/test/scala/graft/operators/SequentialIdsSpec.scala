package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SequentialIdsSpec extends AnyFunSuite with SparkTestSession {

  test("assign stamps first..first+n-1 in order-column order, distributed") {
    val n = 10000L
    // ord descending vs the range values and scrambled across partitions,
    // so a correct result requires the range exchange + local sorts
    val df = spark.range(n).toDF("v")
      .withColumn("ord", lit(n - 1) - col("v"))
      .repartition(16)
    // numPartitions pinned: at this toy scale AQE would (correctly)
    // coalesce the range exchange to one partition and mask the property
    val out = SequentialIds.assign(df, "ord", "id", first = 1000L,
      numPartitions = 8)
    assert(out.rdd.getNumPartitions > 1,
      "id stamping must not funnel through one task")
    val rows = out.select("id", "ord").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1000L until 1000L + n))
    assert(rows.forall { case (id, ord) => id - 1000L == ord })
  }

  test("id-assignment plan range-partitions; no single-partition exchange") {
    val df = spark.range(1000L).toDF("ord").repartition(8)
    val plan = SequentialIds.rangeSorted(df, "ord", 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}
