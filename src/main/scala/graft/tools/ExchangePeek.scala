package graft.tools

import graft.{SparkEntry, Tables}

/** Exchange-dedup inspector: prints every ShuffleExchangeExec in a
  * registry query's NON-ADAPTIVE physical plan grouped by canonical
  * form — occurrence count, partitioning, and the canonical subtree of
  * one representative per group (truncated). The tool behind the
  * "which consumer defeats exchange reuse" question (round 17: the
  * class aggregation of td_incremental_dedup planned 3 exchanges, 2
  * canonical forms — this shows the residual diff). Measurement
  * tooling only.
  *
  * {{{ tools/runmain.sh graft.tools.ExchangePeek td_incremental_dedup }}}
  */
object ExchangePeek {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("td_incremental_dedup")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Tables.pinDialect(Tables.localSession("graft-expeek", "4"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = SparkEntry.registry(name).build(spark, sfDir)
      .queryExecution.executedPlan
    val groups = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.groupBy(_.canonicalized)
    val reused = plan.collect {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }.size
    println(s"[expeek] $name: ${groups.values.map(_.size).sum} exchanges, " +
      s"${groups.size} canonical forms, $reused ReusedExchange nodes")
    groups.toSeq.sortBy(-_._2.size).zipWithIndex.foreach {
      case ((canon, es), i) =>
        println(s"\n---- form #$i ×${es.size}: ${es.head.outputPartitioning}")
        println(canon.toString.linesIterator.take(12).mkString("\n"))
    }
    spark.stop()
  }
}
