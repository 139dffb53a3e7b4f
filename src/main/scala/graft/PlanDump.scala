package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

/** Plan-audit artifact: `explain("formatted")` of every BATCH registry
  * query at the given SF, written to one file — the committed evidence
  * for the per-round plan review (PushedFilters reaching scans, pruned
  * ReadSchemas, broadcast joins, WholeStageCodegen spans, no cartesian
  * products). Streaming (`st_`) queries are excluded: building them
  * executes the stream; their stateful operators are covered in batch
  * form and by PlanSpec's gates.
  *
  * {{{ sbt "runMain graft.PlanDump /root/testdata/sf0.001 PLANS.txt" }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outPath = if (args.length > 1) args(1) else "PLANS.txt"
    val spark = Tables.pinDialect(Tables.localSession("graft-plandump", "4"))
    val sb = new StringBuilder
    sb.append(s"# Physical plans (explain formatted) at $sfDir\n")
    for (name <- SparkEntry.registry.keys.filterNot(_.startsWith("st_"))
        .toSeq.sorted) {
      val df = SparkEntry.registry(name).build(spark, sfDir)
      sb.append(s"\n${"=" * 72}\n== $name\n${"=" * 72}\n")
      sb.append(df.queryExecution.explainString(FormattedMode)).append('\n')
    }
    Files.write(Paths.get(outPath),
      sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[plandump] wrote $outPath")
    spark.stop()
  }
}
