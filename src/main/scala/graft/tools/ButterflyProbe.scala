package graft.tools

import graft.Tables
import graft.operators.Butterfly
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shape A/B for the butterfly operator on the REGISTRY graph (the
  * purchase bipartition rel_graph_butterfly_vp runs on): times
  * globalCount and both perVertexCounts attribution regimes
  * back-to-back in one JVM, each twice (cold = plan+codegen+execute,
  * warm = steady state), with per-phase shuffle-write bytes. This is
  * measurement tooling only — it exists so regime decisions in
  * operators/Butterfly.scala rest on measured numbers from the exact
  * query graph, not on full-sweep bench deltas where JIT state and
  * neighboring queries move the baseline.
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ButterflyProbe" }}}
  */
object ButterflyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.pinDialect(Tables.localSession("graft-bfprobe", cpus))

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
    def settled(): Long = {
      var prev = -1L; var cur = shuffleBytes.get(); var spins = 0
      while (cur != prev && spins < 40) {
        Thread.sleep(25); prev = cur; cur = shuffleBytes.get(); spins += 1
      }
      cur
    }
    def timed(label: String)(f: => Long): Unit = {
      System.gc()
      val b = settled(); val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = (settled() - b) / 1e6
      println(f"[bfprobe] $label%-28s $sec%6.2f s  $mb%8.1f MB  rows=$n")
    }

    // the registry graph: parity-encoded purchase bipartition
    def edges: DataFrame = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

    spark.range(1000000).selectExpr("sum(id)").collect()
    // JIT warm-up on the same plan family, untimed
    Butterfly.globalCount(edges, "src", "dst").count()

    for (round <- 1 to 2) {
      timed(s"globalCount #$round")(
        Butterfly.globalCount(edges, "src", "dst").count())
    }
    // broadcast-vs-shuffle wedge join A/B: the und cache's accurate
    // stats can flip the v-join to a broadcast of one leg
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (round <- 1 to 2) {
      timed(s"globalCount noBcast #$round")(
        Butterfly.globalCount(edges, "src", "dst").count())
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // phase decomposition of the attribution cost beyond enumeration
    def wd: DataFrame = Butterfly.wedges(edges, "src", "dst")
    def pc0: DataFrame = wd.groupBy("u", "w")
      .agg(count(lit(1)).as("k")).filter(col("k") >= 2)
    for (round <- 1 to 2) timed(s"wedges.count #$round")(wd.count())
    for (round <- 1 to 2) timed(s"pairCounts.count #$round")(pc0.count())
    val pcCached = pc0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("pc persist+count (build)")(pcCached.count())
    timed("pc count (cached)")(pcCached.count())
    for (round <- 1 to 2) {
      timed(s"joinback vs cached pc #$round")(
        wd.join(broadcast(pcCached), Seq("u", "w"))
          .select(col("v").as("id"), (col("k") - 1).as("bf"))
          .groupBy("id").agg(sum("bf")).count())
    }
    pcCached.unpersist()
    for (round <- 1 to 2) {
      timed(s"joinback vs inline pc #$round")(
        wd.join(broadcast(pc0), Seq("u", "w"))
          .select(col("v").as("id"), (col("k") - 1).as("bf"))
          .groupBy("id").agg(sum("bf")).count())
    }
    for (round <- 1 to 2) {
      timed(s"vp adaptive(bcast) #$round")(
        Butterfly.perVertexCounts(edges, "src", "dst").count())
    }
    spark.conf.set(Butterfly.ProbePairBoundConf, "0")
    for (round <- 1 to 2) {
      timed(s"vp windowed #$round")(
        Butterfly.perVertexCounts(edges, "src", "dst").count())
    }
    spark.conf.unset(Butterfly.ProbePairBoundConf)
    spark.stop()
  }
}
