package graft.tools

import graft.{SparkEntry, Tables}
import scala.collection.mutable.ArrayBuffer

/** Per-stage attribution probe for a single registry query: runs it
  * against a (possibly stress-scaled) table dir and prints one line
  * per completed stage — task count, summed executor run time, wall
  * span, shuffle read/write — plus the formatted plan. Exists to
  * attribute scale-rung movers to a STAGE (e.g. an AQE-coalesced
  * partition count starving the ADC projection) instead of guessing
  * from whole-query walls. An optional 3rd arg is a semicolon list of
  * runtime SQL confs to A/B plan knobs in the same JVM.
  *
  * {{{ sbt "runMain graft.tools.AnnProbe td_ann_pq_rerank /tmp/graft-stress-x100" }}}
  * {{{ sbt "runMain graft.tools.AnnProbe td_ann_pq_rerank /tmp/graft-stress-x100 spark.sql.adaptive.enabled=false" }}}
  */
object AnnProbe {

  private case class StageRow(id: Int, attempt: Int, name: String,
      tasks: Int, runMs: Long, wallMs: Long,
      shReadMb: Double, shWriteMb: Double, records: Long)

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("td_ann_pq_rerank")
    val dir = if (args.length > 1) args(1) else "/tmp/graft-stress-x100"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.pinDialect(Tables.localSession("graft-annprobe", cpus))
    if (args.length > 2) args(2).split(";").filter(_.nonEmpty).foreach { kv =>
      // clear message instead of an opaque MatchError when the '=' is
      // forgotten (same arg-validation discipline as the stress modes)
      require(kv.contains("="), s"conf A/B arg '$kv' is not key=value")
      val Array(k, v) = kv.split("=", 2)
      println(s"[annprobe] conf $k=$v")
      spark.conf.set(k, v)
    }

    val stages = ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val m = si.taskMetrics
          val wall = (for {
            a <- si.completionTime; b <- si.submissionTime
          } yield a - b).getOrElse(-1L)
          stages.synchronized {
            stages += StageRow(si.stageId, si.attemptNumber(),
              si.name.takeWhile(_ != '\n').take(60), si.numTasks,
              m.executorRunTime, wall,
              m.shuffleReadMetrics.totalBytesRead / 1e6,
              m.shuffleWriteMetrics.bytesWritten / 1e6,
              m.shuffleWriteMetrics.recordsWritten)
          }
        }
      })

    def run(tag: String): Unit = {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain late stage-completed events
      println(f"[annprobe] $tag $name rows=$n wall=$sec%.2f s")
      val rows = stages.synchronized(stages.sortBy(-_.runMs).toVector)
      println(f"[annprobe] ${"stage"}%-8s ${"tasks"}%5s ${"runSec"}%8s " +
        f"${"wallSec"}%8s ${"shRdMB"}%8s ${"shWrMB"}%8s ${"recs"}%12s  name")
      rows.foreach { r =>
        println(f"[annprobe] ${r.id}%-4d a${r.attempt}%-3d ${r.tasks}%5d " +
          f"${r.runMs / 1e3}%8.1f ${r.wallMs / 1e3}%8.1f ${r.shReadMb}%8.1f " +
          f"${r.shWriteMb}%8.1f ${r.records}%12d  ${r.name}")
      }
    }
    run("cold")
    run("warm")
    println("[annprobe] plan:")
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
