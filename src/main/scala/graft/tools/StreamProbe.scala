package graft.tools

import graft.{SparkEntry, Tables}

/** One-off latency probe for a streaming registry query under different
  * shuffle-partition (= state-store instance) counts — the knob that
  * sets per-micro-batch state-commit fan-out. Usage:
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
      val t0 = System.nanoTime()
      val n = SparkEntry.registry(name).build(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name parts=$p run$run: $sec%.2f s rows=$n")
    }
    spark.stop()
  }
}
