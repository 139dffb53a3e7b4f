package graft.plans

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def viaOperator(k: Int) =
    TopK.topKPerKey(Tables.load(spark, sfDir, "lineitem"),
      keys = Seq(col("l_returnflag"), col("l_linestatus")),
      order = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc),
      k = k)

  test("operator result equals the declarative window form row-for-row") {
    val w = Window.partitionBy(col("l_returnflag"), col("l_linestatus"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    val declarative = Tables.load(spark, sfDir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    val cols = declarative.columns.map(col).toSeq
    val a = viaOperator(5).select(cols: _*)
      .orderBy(cols: _*).collect().toSeq
    val b = declarative.select(cols: _*).orderBy(cols: _*).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("physical plan uses TopKPerKeyExec with a hash exchange, no input sort") {
    val plan = viaOperator(3).queryExecution.executedPlan.toString
    // partial (map-side) + final — the exchange between them moves only
    // k rows per key per map partition, never the input (regression:
    // the direct API once planned final-only and shuffled everything)
    assert(plan.linesIterator.count(_.contains("TopKPerKey")) == 2, plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Window"), plan)
    // the final pass streams a SORTED pruned exchange (O(1) state, spill
    // via SortExec) — but the map side must stay sortless: no Sort may
    // appear below the exchange, where the full input lives
    val lines = plan.linesIterator.toSeq
    val exchangeAt = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(exchangeAt >= 0, plan)
    assert(!lines.drop(exchangeAt + 1).exists(_.contains("Sort ")),
      s"no sort of the full input expected below the exchange:\n$plan")
  }

  test("partial pass degrades to pass-through under a tiny memory budget") {
    // with a 1 KB budget nearly every row streams through the map side
    // unbuffered; the sorted final pass must still produce exactly the
    // declarative window result
    spark.conf.set("spark.graft.topk.partialBudgetBytes", "1024")
    try {
      val w = Window.partitionBy(col("l_returnflag"), col("l_linestatus"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
      val declarative = Tables.load(spark, sfDir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5).drop("rn")
      val cols = declarative.columns.map(col).toSeq
      val a = viaOperator(5).select(cols: _*)
        .orderBy(cols: _*).collect().toSeq
      val b = declarative.select(cols: _*).orderBy(cols: _*).collect().toSeq
      assert(a == b && a.nonEmpty)
    } finally spark.conf.unset("spark.graft.topk.partialBudgetBytes")
  }

  test("run-aware partial cut bounds map output at ~n*k under any budget") {
    // the ANN probe-cut shape: each key's rows CONSECUTIVE (one outer
    // row expanded by a broadcast join). Before the run cut, a task
    // whose key count overflowed the byte budget streamed EVERY row of
    // every untracked key (n × cells); the run cut caps it at the run
    // survivors (~n·k) regardless of budget — measured at the 800× ANN
    // rung as 405M → 3.2M probe-cut rows (BASELINE round 15).
    spark.conf.set("spark.graft.topk.partialBudgetBytes", "1024")
    try {
      val n = 1000L
      val fanout = 50
      val df = spark.range(n).toDF("key")
        .join(broadcast(spark.range(fanout).toDF("v")))
        .select(col("key"), pmod(col("v") * 7, lit(fanout)).as("score"))
      val partialOnly = org.apache.spark.sql.graft.PlanShim.ofRows(spark,
        TopKPerKey(
          Seq(org.apache.spark.sql.graft.PlanShim.expression(col("key"))),
          Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
            org.apache.spark.sql.graft.PlanShim.expression(col("score")),
            org.apache.spark.sql.catalyst.expressions.Ascending)),
          k = 2, df.queryExecution.analyzed, partial = true))
      val cnt = partialOnly.count()
      assert(cnt <= n * 2 + 64,
        s"partial pass emitted $cnt rows for $n consecutive-key groups " +
          s"(pre-run-cut behavior would emit ~${n * fanout})")
      // and the cut is still a correct superset: the full pair equals
      // the declarative window under the same tiny budget
      val w = Window.partitionBy(col("key"))
        .orderBy(col("score").asc, col("v").asc)
      val src = spark.range(n).toDF("key")
        .join(broadcast(spark.range(fanout).toDF("v")))
        .select(col("key"), col("v"),
          pmod(col("v") * 7, lit(fanout)).as("score"))
      val a = TopK.topKPerKey(src, keys = Seq(col("key")),
          order = Seq(col("score").asc, col("v").asc), k = 2)
        .orderBy("key", "score", "v").collect().toSeq
      val b = src.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
        .orderBy("key", "score", "v").collect().toSeq
      assert(a == b && a.nonEmpty)
    } finally spark.conf.unset("spark.graft.topk.partialBudgetBytes")
  }

  test("k=1 degenerates to first-per-key") {
    val got = viaOperator(1)
      .groupBy("l_returnflag", "l_linestatus").count().collect()
    assert(got.forall(_.getLong(2) == 1L))
  }

  test("optimizer rule rewrites declarative rn<=k window filters to TopKPerKey") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    val declarative = Tables.load(spark, sfDir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .select("l_returnflag", "l_orderkey", "l_linenumber")
    val plan = declarative.queryExecution.executedPlan.toString
    // partial (map-side) + final TopKPerKey, Spark's sort-based
    // WindowGroupLimit replaced, no Window exec left
    assert(plan.linesIterator.count(_.contains("TopKPerKey")) == 2, plan)
    assert(!plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("Window ["), plan)
    // and the rewrite preserves results (vs. the rule disabled via a
    // projection that keeps the rank column, which must NOT rewrite)
    val withRank = Tables.load(spark, sfDir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "rn")
    val keptPlan = withRank.queryExecution.executedPlan.toString
    assert(keptPlan.contains("Window"), keptPlan)
    val a = declarative.orderBy("l_returnflag", "l_orderkey", "l_linenumber")
      .collect().toSeq
    val b = withRank.drop("rn")
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("empty PARTITION BY (global top-k) does not rewrite and still runs") {
    val w = Window.orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val global = Tables.load(spark, sfDir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("l_returnflag", "l_orderkey", "l_linenumber")
    val plan = global.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey"), plan)
    // must plan and execute (round-1 regression: ClusteredDistribution(Nil))
    assert(global.collect().length == 10)
  }

  test("spark.graft.topk.rewrite=false keeps the sort-based window plan") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc)
    def build() = Tables.load(spark, sfDir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("l_returnflag", "l_orderkey")
    spark.conf.set("spark.graft.topk.rewrite", "false")
    try {
      val off = build().queryExecution.executedPlan.toString
      assert(!off.contains("TopKPerKey"), off)
    } finally spark.conf.unset("spark.graft.topk.rewrite")
    val on = build().queryExecution.executedPlan.toString
    assert(on.contains("TopKPerKey"), on)
  }
}
