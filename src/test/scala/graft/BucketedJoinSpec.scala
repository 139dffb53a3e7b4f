package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketing scale lever: a fact-fact equi-join between tables
  * bucketed on the join key is co-located, so the physical plan has NO
  * shuffle exchange — at 100 TB this turns the biggest recurring join
  * cost into a local zip of pre-sorted buckets. Asserted here so the
  * property is pinned, not just claimed (SURVEY.md scale posture).
  */
class BucketedJoinSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  test("join of tables bucketed on the key plans without a shuffle") {
    // tables land in the session's default warehouse; dropped in finally
    val buckets = 4
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .write.mode("overwrite")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bkt_lineitem")
    Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bkt_orders")
    try {
      // disable auto-broadcast so the join strategy is the bucketed SMJ
      // the 100 TB case would use, not a small-data broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_lineitem")
        .join(spark.table("bkt_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the join itself reads bucket-aligned scans: zero shuffles before
      // it (the aggregate after may still exchange on its own key)
      val beforeAgg = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!beforeAgg.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.collect().map(_.getLong(1)).sum ==
        Tables.load(spark, sfDir, "lineitem").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
    }
  }
}
