package graft.tools

import graft.{RelStress, Tables}

/** Scale-cliff probe for the STREAMING layer — the last family without
  * one (rel_ has [[graft.RelStress]], td_ [[graft.StressSmoke]], the
  * graph operators [[GraphStress]]): replays every `st_*` registry
  * query against a factor-scaled copy of the fixture directory and
  * reports cold/warm wall time plus settled shuffle-write per query.
  *
  * The scaled copy comes from [[graft.RelStress.scaleTo]] — the SAME
  * user-universe growth model the relational sweep uses (each replica
  * an independent user population, `user_id + rep * stride`, per-user
  * behavior unchanged). For streaming that model is the interesting
  * one: state volume (sessionization windows, dedup keys, join buffers,
  * timer registrations) grows linearly in the factor while per-key
  * cardinality stays fixed, which is exactly how a production stream's
  * state grows — more users, not deeper per-user histories. Watermark
  * eviction behavior is unchanged because event-time spans are NOT
  * shifted per replica.
  *
  * The state-partition count stays at the family default
  * (`spark.graft.stream.statePartitions`, 4) unless overridden on the
  * session — deliberately: holding partitions fixed while state grows
  * measures per-partition state pressure, the quantity a cluster
  * operator would watch to decide when to re-shard. Pass a 4th arg to
  * override for an A/B.
  *
  * A 5th arg `noop` runs the sweep ENGINE-ONLY (VERDICT r11 #1):
  * every query's streaming plan runs through Spark's noop sink via
  * `spark.graft.stream.sink=noop`, so the committed scale tables can
  * separate state-machinery cost from the memory-sink collection the
  * oracle harness pays (and a production sink never does). Run each
  * (rung, mode) in its own JVM so neither sweep warms the other; the
  * metric name distinguishes the records
  * (`streamstress_engine_total` vs `streamstress_total`).
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StreamStress 10" }}}
  * {{{ sbt "runMain graft.tools.StreamStress 10 /root/testdata/sf0.1 /tmp/x10 4 noop" }}}
  */
object StreamStress {

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10)
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) args(2)
      else s"${System.getProperty("java.io.tmpdir")}/graft-streamstress-x$scale"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark =
      Tables.pinDialect(Tables.localSession("graft-streamstress", cpus))
    if (args.length > 3 && args(3).nonEmpty)
      spark.conf.set("spark.graft.stream.statePartitions", args(3))
    val engineOnly = args.length > 4 && args(4) == "noop"
    if (engineOnly) spark.conf.set("spark.graft.stream.sink", "noop")
    RelStress.scaleToIfAbsent(spark, src, out, scale, cpus.toInt)
    RelStress.sweep(spark, out, "st_",
      if (engineOnly) "streamstress_engine_total" else "streamstress_total",
      scale)
    spark.stop()
  }
}
