package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.{SparkEntry, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Focused single-query probe: runs one registry query cold + warm with
  * per-run shuffle-write bytes, for iterating on a specific plan without
  * paying for the whole [[graft.Bench]] sweep.
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.BenchOne rel_graph_butterfly_vp /root/testdata/sf0.1" }}}
  */
object BenchOne {

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: BenchOne <queryName> [sfDir]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.pinDialect(spark)
    // ad-hoc conf overrides for A/B probes (bench-only knobs like
    // spark.graft.ann.queryIdBound / knngraph.nodeBound):
    //   SPARK_GRAFT_CONF="k1=v1;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';')
      .map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k.trim, v)
          case _ => sys.error(
            s"SPARK_GRAFT_CONF segment '$kv' is not key=value")
        }
      })

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

    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    spark.range(1000000).selectExpr("sum(id)").collect() // session warm-up
    def run(): (Double, Double) = {
      val before = settled()
      val t0 = System.nanoTime()
      // full-output executor-side consume — see graft.Bench.consume
      // for why DataFrame.count() is not a faithful benchmark action
      val n = graft.Bench.consume(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = (settled() - before) / 1e6
      println(f"[benchone] $name rows=$n sec=$sec%.2f shuffle_mb=$mb%.1f")
      (sec, mb)
    }
    val (coldSec, coldMb) = run()
    val (warmSec, warmMb) = run()
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      fn(spark, sfDir).explain("formatted")
    println(f"""{"query":"$name","cold_sec":$coldSec%.3f,"cold_shuffle_mb":$coldMb%.1f,"warm_sec":$warmSec%.3f,"warm_shuffle_mb":$warmMb%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
