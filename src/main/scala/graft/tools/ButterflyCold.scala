package graft.tools

import graft.{SparkEntry, Tables}

/** Cold-wall attribution for rel_graph_butterfly (VERDICT r16 #4: the
  * slowest bench entry four rounds running — ~12-13.5 s cold against
  * 0.33 s warm and a flat 0.2 MB shuffle, i.e. ALL the cost is
  * first-run overhead of one kind or another). This probe runs the
  * query ONCE in a fresh JVM and splits the cold wall into the only
  * four places it can live:
  *
  *   1. `build_s`    — constructing the DataFrame (registry closure:
  *                     Memo builder, plan assembly — pure driver);
  *   2. `plan_s`     — analysis + optimization + physical planning
  *                     (`queryExecution.executedPlan` — pure driver);
  *   3. `exec_s`     — first execution (includes Janino compilation of
  *                     every generated stage, the operator's persist
  *                     materialization, and the actual compute);
  *   4. within 3, `codegen_ms`/`codegen_n` — the generated-class
  *                     compile time the JVM recorded
  *                     (CodegenMetrics.METRIC_COMPILATION_TIME), the
  *                     only sub-split execution exposes without
  *                     sampling.
  *
  * A `warm_s` second run closes the loop (it should reproduce the
  * bench's ~0.3 s). Measurement tooling only — the regime decisions
  * stay in operators/Butterfly.scala.
  *
  * {{{ tools/runmain.sh graft.tools.ButterflyCold rel_graph_butterfly /root/testdata/sf0.1 }}}
  */
object ButterflyCold {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("rel_graph_butterfly")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.pinDialect(Tables.localSession("graft-bfcold", cpus))

    def codegenStats(): (Long, Long) = {
      val h = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME
      (h.getCount, h.getSnapshot.getValues.sum)
    }

    val (n0, ms0) = codegenStats()
    val t0 = System.nanoTime()
    val df = SparkEntry.registry(name).build(spark, sfDir)
    val t1 = System.nanoTime()
    val analyzed = df.queryExecution.analyzed
    val tA = System.nanoTime()
    val optimized = df.queryExecution.optimizedPlan
    val tO = System.nanoTime()
    val plan = df.queryExecution.executedPlan
    val t2 = System.nanoTime()
    val rows = df.collect().length
    val t3 = System.nanoTime()
    val (n1, ms1) = codegenStats()
    val warmT0 = System.nanoTime()
    SparkEntry.registry(name).build(spark, sfDir).collect()
    val warmS = (System.nanoTime() - warmT0) / 1e9
    def nodes(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Int =
      1 + p.children.map(c =>
        nodes(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]]))
        .sum
    println(s"[bfcold] rows=$rows analyzed_nodes=${nodes(analyzed)} " +
      s"optimized_nodes=${nodes(optimized)} physical_nodes=${nodes(plan)}")
    println(f"""{"metric":"butterfly_cold","query":"$name",""" +
      f""""build_s":${(t1 - t0) / 1e9}%.2f,""" +
      f""""analyze_s":${(tA - t1) / 1e9}%.2f,""" +
      f""""optimize_s":${(tO - tA) / 1e9}%.2f,""" +
      f""""physical_s":${(t2 - tO) / 1e9}%.2f,""" +
      f""""exec_s":${(t3 - t2) / 1e9}%.2f,""" +
      f""""codegen_ms":${ms1 - ms0},"codegen_n":${n1 - n0},""" +
      f""""warm_s":$warmS%.2f}""")
    spark.stop()
  }
}
