package graft.tools

import graft.{SparkEntry, Tables}

/** Minimal reproducer for whole-stage-codegen compile fallbacks: runs
  * one registry query with the codegen logger at DEBUG so the ERROR
  * "Failed to compile" is followed by the formatted generated source
  * (the only way to see WHICH generated function is malformed — the
  * fallback to interpreted execution hides everything but the Janino
  * parse error). Measurement tooling only.
  *
  * {{{ SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.CodegenProbe td_ann_pq /root/testdata/sf0.01" }}}
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("td_ann_pq")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.pinDialect(Tables.localSession("graft-cgprobe", cpus))
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.DEBUG)
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(s"[cgprobe] $name rows=$n")
    spark.stop()
  }
}
