package graft.tools

import graft.{SparkEntry, Tables}

/** One-off latency probe for a registry query under different
  * state/shuffle partition counts. For streaming queries the effective
  * knob is `spark.graft.stream.statePartitions` — runToMemory
  * (StreamingQueries.scala) overwrites `spark.sql.shuffle.partitions`
  * with it around every streaming run, so that is what the probe must
  * sweep (sweeping the shuffle setting would measure the default 8
  * every iteration); batch queries read the same value via the plain
  * shuffle setting, so both are set. Usage:
  * {{{ sbt "runMain graft.tools.StreamProbe st_interval_join 32,8,4" }}}
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "st_interval_join"
    val parts = (if (args.length > 1) args(1) else "32,8,4").split(",")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.pinDialect(Tables.localSession("graft-streamprobe", "32"))
    for (p <- parts; run <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      spark.conf.set("spark.graft.stream.statePartitions", p)
      val t0 = System.nanoTime()
      val n = SparkEntry.registry(name).build(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name parts=$p run$run: $sec%.2f s rows=$n")
    }
    spark.stop()
  }
}
