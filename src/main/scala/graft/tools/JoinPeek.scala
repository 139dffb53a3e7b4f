package graft.tools

import graft.{SparkEntry, Tables}

/** Post-execution join-strategy inspector: runs a registry query on a
  * fixture dir and prints the FINAL adaptive physical plan's join
  * nodes (class, build side when applicable, condition) — the question
  * StagePeek can't answer when a rung's join-stage CPU moves and the
  * suspect is an AQE strategy flip at that scale. Measurement tooling
  * only.
  *
  * {{{ tools/runmain.sh graft.tools.JoinPeek td_incremental_dedup /tmp/graft-stress-x1600 }}}
  */
object JoinPeek {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("td_incremental_dedup")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.pinDialect(Tables.localSession("graft-joinpeek", cpus))
    val df = SparkEntry.registry(name).build(spark, dir)
    val n = df.collect().length
    val plan = df.queryExecution.executedPlan
    println(s"[joinpeek] $name rows=$n")
    // stripped AQE wrapper: executedPlan.toString on a finished
    // AdaptiveSparkPlanExec prints the final plan (isFinalPlan=true)
    plan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("isFinalPlan"))
      .foreach(println)
    spark.stop()
  }
}
