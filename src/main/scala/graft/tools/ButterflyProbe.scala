package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.Tables
import graft.operators.Butterfly
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Shuffle-byte decomposition of the butterfly per-vertex plan: times
  * each stage (wedge enumeration, pair aggregation, full per-vertex
  * counting) separately with its shuffle-write delta, so a regression in
  * the one-exchange discipline shows up as a stage number, not a guess.
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ButterflyProbe /root/testdata/sf0.1" }}}
  */
object ButterflyProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.pinDialect(Tables.localSession("bf-probe", cpus))
    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    def settled(): Long = {
      var prev = -1L; var cur = shuffleBytes.get(); var spins = 0
      while (cur != prev && spins < 40) {
        Thread.sleep(25); prev = cur; cur = shuffleBytes.get(); spins += 1
      }
      cur
    }
    def stage(name: String)(f: => Long): Unit = {
      val b = settled(); val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bfprobe] $name rows=$n sec=$sec%.2f shuffle_mb=${(settled() - b) / 1e6}%.1f")
    }
    // exchange-reuse sanity check: a self-union of one aggregation
    // should shuffle the input once, not twice
    stage("reuse_single") {
      spark.read.parquet(s"$src/lineitem.parquet")
        .select("l_orderkey", "l_partkey").distinct().count()
    }
    stage("reuse_union") {
      val d = spark.read.parquet(s"$src/lineitem.parquet")
        .select("l_orderkey", "l_partkey").distinct()
      d.union(d).count()
    }
    // optional second arg: hub-fixture scale (GraphStress's shape) for
    // an on-box A/B of attribution shapes at stress volume
    val stressScale = if (args.length > 1) args(1).toInt else 0
    val edges = {
      val base0 = Tables.load(spark, src, "lineitem")
        .join(Tables.load(spark, src, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      if (stressScale <= 0)
        base0.select((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
      else {
        val base = base0.distinct()
          .filter(pmod(xxhash64(col("c"), col("s")), lit(10)) === 0)
        val mx = base.agg(max(col("s")), max(col("c"))).head
        val (sStride, hubBase) = (mx.getLong(0) + 1, mx.getLong(1) + 1)
        val tail = base.crossJoin(
            broadcast(spark.range(stressScale).toDF("rep")))
          .select(col("c"), (col("s") + col("rep") * lit(sStride)).as("s"))
        val hubs = tail.select(col("s")).distinct()
          .crossJoin(broadcast(spark.range(10).toDF("h")))
          .select((col("h") + lit(hubBase)).as("c"), col("s"))
        tail.union(hubs)
          .select((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
      }
    }
    // the round-8 attribution shape (window WITHOUT the shared
    // repartition / count(v) reuse parity), for on-box comparison
    def oldShape(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val wdo = Butterfly.wedges(e, "src", "dst")
        .withColumn("k", count(lit(1)).over(Window.partitionBy("u", "w")))
      val pairTerms = wdo.select(col("u"), col("w"), col("k")).distinct()
        .select(explode(array(col("u"), col("w"))).as("id"),
          expr("k * (k - 1) div 2").as("bf"))
      val centerTerms = wdo.select(col("v").as("id"), (col("k") - 1).as("bf"))
      pairTerms.union(centerTerms)
        .groupBy("id").agg(sum("bf").as("butterflies"))
        .filter(col("butterflies") > 0)
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    if (stressScale > 0) {
      val e = edges.cache()
      stage("stress_edges")(e.count())
      stage("old_shape_cold")(oldShape(e).count())
      stage("old_shape_warm")(oldShape(e).count())
      stage("new_shape_cold")(Butterfly.perVertexCounts(e, "src", "dst").count())
      stage("new_shape_warm")(Butterfly.perVertexCounts(e, "src", "dst").count())
      e.unpersist()
      spark.stop()
      return
    }
    stage("wedges")(Butterfly.wedges(edges, "src", "dst").count())
    stage("pairs_k2")(Butterfly.wedges(edges, "src", "dst")
      .groupBy("u", "w").agg(count(lit(1)).as("k"))
      .filter(col("k") >= 2).count())
    stage("perVertex_cold")(Butterfly.perVertexCounts(edges, "src", "dst").count())
    val pv = Butterfly.perVertexCounts(edges, "src", "dst")
    stage("perVertex_warm")(pv.count())
    // the graded registry query, with its executed (post-AQE) join types
    val reg = graft.SparkEntry.queries("rel_graph_butterfly_vp")
    stage("registry_cold")(reg(spark, src).count())
    val regDf = reg(spark, src)
    stage("registry_warm") { regDf.collect(); regDf.count() }
    regDf.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join ") || l.contains("hashpartitioning(u"))
      .map(_.replaceAll("\\s+", " ").take(110))
      .foreach(l => println(s"[bfplan] $l"))
    // executed (post-AQE) plan: which joins actually ran as broadcast
    val joins = pv.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .map(_.replaceAll("\\s+", " ").take(120)).toSeq
    joins.foreach(l => println(s"[bfplan] $l"))
    spark.stop()
  }
}
