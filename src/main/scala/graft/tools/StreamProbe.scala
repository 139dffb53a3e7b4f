package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Phase profiler for the streaming harness's fixed costs (VERDICT r9
  * #5): runs a few representative AvailableNow micro-batch queries and
  * prints, per micro-batch, the engine's own durationMs breakdown
  * (triggerExecution / queryPlanning / getBatch / addBatch / walCommit /
  * commitOffsets / stateStoreCommit ...) plus the wall time around
  * start→awaitTermination. This is measurement tooling only — it feeds
  * the tuning decisions in StreamingQueries (state-partition sizing,
  * complete-mode no-data skip), it is not part of the engine surface.
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StreamProbe" }}}
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.pinDialect(Tables.localSession("graft-streamprobe", cpus))

    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        progress.add(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${dur}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    // warm the machinery once so the first probe isn't class-loading
    def runOnce(label: String)(mk: => org.apache.spark.sql.DataFrame,
        mode: String): Unit = {
      progress.clear()
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STATE_PARTS", "8"))
      val t0 = System.nanoTime()
      try {
        val q = mk.writeStream.format("noop")
          .option("checkpointLocation", java.nio.file.Files
            .createTempDirectory("graft-probe-ck-").toString)
          .outputMode(mode).trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat
      Thread.sleep(300)
      println(f"[$label] wall=$sec%.2f s")
      progress.forEach(l => println(l))
    }

    def events = Tables.loadStream(spark, sfDir, "events")

    runOnce("warmup")(events.select(col("event_id")), "append")
    runOnce("append_stateless")(events.select(col("event_id")), "append")
    runOnce("complete_agg")(
      events.groupBy(col("event_type")).agg(count(lit(1)).as("n")),
      "complete")
    runOnce("append_window")(
      events.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n")),
      "append")
    runOnce("dedup")(
      events.select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type"),
      "append")

    // RocksDB state-v2 legs (the family's heaviest fixed costs): A/B
    // changelog checkpointing — full-snapshot-per-commit vs changelog
    import spark.implicits._
    def typed = events
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[graft.streaming.EventStreams.Event]
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    for (changelog <- Seq("false", "true")) {
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled", changelog)
      runOnce(s"rocksdb_mapstate_sessions(changelog=$changelog)")(
        graft.streaming.StateV2.sessionTypeCounts(typed,
          gapSeconds = 21600L, watermark = "0 seconds").toDF(),
        "append")
      runOnce(s"rocksdb_valuestate_dedup(changelog=$changelog)")(
        graft.streaming.StateV2.firstArrivals(events).toDF(),
        "append")
    }
    spark.stop()
  }
}
