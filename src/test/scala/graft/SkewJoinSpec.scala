package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the skew story the dedup/CC layers rely on: AQE's runtime
  * skew-join split actually fires on a hub key and divides its
  * partition across tasks. Plans are asserted AFTER execution — AQE
  * re-plans at runtime, so the pre-execution plan can't show it.
  */
class SkewJoinSpec extends AnyFunSuite with SparkTestSession {

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    // one hub key carrying ~all probe rows + a long tail
    val probe = spark.range(0, 200000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id"))
        .as("k"), col("id").as("payload"))
    val build = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 2).as("dim"))

    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // fixture-scale thresholds so the ~MB hub partition counts as skew
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // forbid broadcast so the join stays a shuffle SMJ (the skew
      // path): BOTH thresholds — static (estimate-driven) and AQE
      // (runtime-size-driven; it defaults from
      // spark.sql.autoBroadcastJoinThreshold and would otherwise
      // promote this fixture-sized build side at runtime)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val joined = probe.join(build, "k")
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      // collect() (not head(): that plans a separate limited query) so
      // THIS QueryExecution's adaptive plan runs and finalizes
      val row = joined.collect().head
      // hub: 180000 rows at k=7; tail: ids 0,10,...,990 match build keys
      assert(row.getLong(0) == 180100L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join (no skew=true):\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
