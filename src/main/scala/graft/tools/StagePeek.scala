package graft.tools

import graft.{SparkEntry, Tables}
import scala.collection.mutable.ArrayBuffer

/** Per-stage wall/volume breakdown for one registry query on one
  * fixture dir — the measurement step between "the rung is slow" and
  * "THIS exchange/sort/join stage is why" (VERDICT r16 #1's residual:
  * td_incremental_dedup's 800×→1600× cold ratio). Prints one line per
  * stage: wall, task-time sum, input/shuffle volumes, and the first
  * plan-ish token of the stage name. Measurement tooling only.
  *
  * {{{ tools/runmain.sh graft.tools.StagePeek td_incremental_dedup /tmp/graft-stress-x400 }}}
  */
object StagePeek {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("td_incremental_dedup")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.pinDialect(Tables.localSession("graft-stagepeek", cpus))

    case class Agg(var taskMs: Long = 0, var cpuMs: Long = 0,
      var inRec: Long = 0, var srRec: Long = 0, var swRec: Long = 0,
      var swB: Long = 0, var spillB: Long = 0, var sortMs: Long = 0,
      var n: Int = 0)
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, Agg]()
    val walls = new java.util.concurrent.ConcurrentHashMap[Int, Double]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            val a = byStage.computeIfAbsent(e.stageId, _ => Agg())
            a.synchronized {
              a.taskMs += m.executorRunTime
              a.cpuMs += m.executorCpuTime / 1000000
              a.inRec += m.inputMetrics.recordsRead
              a.srRec += m.shuffleReadMetrics.recordsRead
              a.swRec += m.shuffleWriteMetrics.recordsWritten
              a.swB += m.shuffleWriteMetrics.bytesWritten
              a.spillB += m.memoryBytesSpilled
              a.sortMs += m.shuffleWriteMetrics.writeTime / 1000000
              a.n += 1
            }
          }
          ()
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          walls.put(si.stageId,
            (si.completionTime.getOrElse(0L) -
              si.submissionTime.getOrElse(0L)) / 1e3)
          ()
        }
      })

    val t0 = System.nanoTime()
    val n = SparkEntry.registry(name).build(spark, dir).collect().length
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"[stagepeek] $name rows=$n wall=$wall%.1f s")
    println(f"${"stage"}%5s ${"wall_s"}%7s ${"task_s"}%8s ${"cpu_s"}%8s " +
      f"${"tasks"}%6s ${"in_rec"}%11s ${"sh_read"}%11s ${"sh_write"}%11s " +
      f"${"sw_MB"}%8s ${"spill_MB"}%9s ${"swrite_s"}%9s")
    import scala.jdk.CollectionConverters._
    byStage.asScala.toSeq.sortBy(-_._2.taskMs).foreach { case (id, a) =>
      println(f"$id%5d ${walls.getOrDefault(id, 0.0)}%7.1f " +
        f"${a.taskMs / 1e3}%8.1f ${a.cpuMs / 1e3}%8.1f ${a.n}%6d " +
        f"${a.inRec}%11d ${a.srRec}%11d ${a.swRec}%11d ${a.swB / 1e6}%8.1f " +
        f"${a.spillB / 1e6}%9.1f ${a.sortMs / 1e3}%9.1f")
    }
    spark.stop()
  }
}
