package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch streaming determinism (VERDICT r4 item 3): the st_*
  * registry queries stream the driver's single file, so every row lands
  * in ONE micro-batch and the cross-batch state transitions in
  * [[EventStreams.sessionize]] are never exercised by the oracle match.
  * This spec replays sf0.001 events as THREE time-ordered file batches
  * (`maxFilesPerTrigger=1`) and asserts the closed-session set still
  * equals the batch sessionization of the same rows.
  *
  * Why time-ordered chunks: with `watermark = 0s` the watermark after
  * batch k is the max event time of batches ≤ k; contiguous-time chunks
  * guarantee no row of batch k+1 is late, so the comparison isolates
  * cross-batch STATE handling from late-data policy. Out-of-order
  * replays are covered (and their documented approximations pinned) by
  * EventStreamsSpec's late-arrival cases.
  */
class StreamingDeterminismSpec extends AnyFunSuite with SparkTestSession {

  private def onePartFile(dir: Path): Path = {
    val files = Files.list(dir).toArray.map(_.asInstanceOf[Path])
      .filter(_.getFileName.toString.endsWith(".parquet"))
    assert(files.length == 1, s"expected one part file in $dir")
    files.head
  }

  private def events0001 =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))

  /** Stage `events` as 3 contiguous-time chunks, one file each, ascending
    * mtimes so the file source replays them in event-time order. */
  private def stageChunks(events: org.apache.spark.sql.DataFrame): Path = {
    val srcDir = Files.createTempDirectory("stream-det-src-")
    val chunked = events.withColumn("_chunk",
      ntile(3).over(Window.orderBy(col("ts"), col("event_id"))))
    (1 to 3).foreach { i =>
      val tmp = Files.createTempDirectory(s"stream-det-chunk$i-")
      chunked.filter(col("_chunk") === i)
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val dst = srcDir.resolve(f"chunk_$i%02d.parquet")
      Files.move(onePartFile(tmp), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 10000L))
    }
    srcDir
  }

  /** Like stageChunks but keeps the input frame's columns as-is
    * (requires ts + event_id for the chunk order). */
  private def stageChunksKeep(events: org.apache.spark.sql.DataFrame): Path = {
    val srcDir = Files.createTempDirectory("stream-det-src-")
    val chunked = events.withColumn("_chunk",
      ntile(3).over(Window.orderBy(col("ts"), col("event_id"))))
    (1 to 3).foreach { i =>
      val tmp = Files.createTempDirectory(s"stream-det-keep$i-")
      chunked.filter(col("_chunk") === i).drop("_chunk")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val dst = srcDir.resolve(f"chunk_$i%02d.parquet")
      Files.move(onePartFile(tmp), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 10000L))
    }
    srcDir
  }

  test("sessionize over 3 time-ordered file batches equals batch sessionization") {
    import spark.implicits._
    val events = events0001
    val srcDir = stageChunks(events)

    val stream = spark.readStream
      .schema(events.select("user_id", "ts", "event_type", "value").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .as[EventStreams.Event]
    val q = EventStreams.sessionize(stream, gapSeconds = 21600L,
        watermark = "0 seconds").toDF()
      .writeStream.format("memory").queryName("det_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(180000) finally q.stop()

    // batch sessionization of the same rows (mirrors the st_sessionize
    // oracle): 6h-gap sessions, excluding each user's last session on
    // BOTH sides — its emission is timing-driven, not data-driven
    events.createOrReplaceTempView("det_events")
    val expected = spark.sql(
      """WITH g AS (SELECT user_id, ts, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS cents,
        |             lag(ts) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS prev
        |           FROM det_events),
        |s AS (SELECT *, CASE WHEN prev IS NULL OR
        |        unix_micros(ts) - unix_micros(prev) > 21600000000
        |        THEN 1 ELSE 0 END AS new_sess FROM g),
        |sid AS (SELECT *, sum(new_sess) OVER
        |          (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS UNBOUNDED PRECEDING) AS session_id FROM s),
        |sess AS (SELECT user_id, min(ts) AS session_start,
        |           max(ts) AS session_end, count(*) AS n_events,
        |           sum(cents) AS value_cents
        |         FROM sid GROUP BY user_id, session_id),
        |mx AS (SELECT user_id, max(ts) AS mx FROM det_events GROUP BY user_id)
        |SELECT sess.user_id, session_start, session_end, n_events, value_cents
        |FROM sess JOIN mx ON sess.user_id = mx.user_id
        |WHERE session_end < mx""".stripMargin)

    val lastTs = events.groupBy(col("user_id")).agg(max(col("ts")).as("_mx"))
    val got = spark.table("det_sessions").join(lastTs, "user_id")
      .filter(col("session_end") < col("_mx"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("value_cents"))

    val missing = expected.exceptAll(got).count()
    val extra = got.exceptAll(expected).count()
    assert(expected.count() > 0, "oracle produced no closed sessions")
    assert(missing == 0 && extra == 0,
      s"closed-session sets diverge: missing=$missing extra=$extra")
  }

  test("native session_window over 3 file batches equals the batch operator") {
    // same replay harness, exercising Spark's built-in session-window
    // STATE (merge-on-arrival + watermark eviction) across micro-batches
    // instead of the hand-rolled flatMapGroupsWithState path. Emitted
    // set = sessions with end <= final watermark (global max ts).
    val events = events0001
    val srcDir = stageChunks(events)
    val stream = spark.readStream
      .schema(events.select("user_id", "ts", "event_type", "value").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("value_cents"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("value_cents"))
    val q = stream.writeStream.format("memory").queryName("det_sw")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(180000) finally q.stop()

    val batch = events
      .select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("value_cents"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("value_cents"))
    val mx = events.agg(max(col("ts"))).head().getTimestamp(0)
    // noPushdown: a bare filter on the merged session end is pushed
    // below MergingSessions onto the per-row windows (unsound — it
    // fabricates shorter sessions; see SessionWindowPushdownSpec)
    val expected = batch.filter(
      graft.functions.GraftFunctions.noPushdown(col("session_end") <= lit(mx)))

    val got = spark.table("det_sw")
    assert(expected.count() > 0)
    assert(expected.exceptAll(got).count() == 0 &&
      got.exceptAll(expected).count() == 0,
      "streamed session_window set diverges from the batch operator")
  }

  test("checkpointed restart resumes from source offsets exactly once") {
    // The production-path guarantee behind every st_* query's design
    // notes: a file-source → parquet-sink stream with a checkpoint
    // location, stopped and restarted after new data arrives, must emit
    // the old data zero more times and the new data exactly once.
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import spark.implicits._
    val src = Files.createTempDirectory("restart-src-")
    val out = Files.createTempDirectory("restart-out-")
    val ck = Files.createTempDirectory("restart-ck-")
    def writeChunk(ids: Range, name: String): Unit = {
      val tmp = Files.createTempDirectory("restart-chunk-")
      ids.map(_.toLong).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      Files.move(onePartFile(tmp), src.resolve(name))
    }
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(StructType(Seq(StructField("id", LongType))))
        .parquet(src.toString)
        .writeStream.format("parquet").option("path", out.toString)
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
    }
    writeChunk(0 until 100, "a.parquet")
    runOnce()
    writeChunk(100 until 150, "b.parquet")
    runOnce() // second incarnation: must pick up ONLY chunk b
    val got = spark.read.parquet(out.toString)
      .as[Long].collect().sorted.toSeq
    assert(got == (0L until 150L), s"expected 0..149 exactly once, got " +
      s"${got.size} rows (${got.diff((0L until 150L)).take(5)} dups/extras)")
  }

  test("transformWithState first-arrival set over 3 batches = DISTINCT") {
    // st_state_v2_dedup's batching-independence claim, actually
    // multi-batched: each key must be emitted EXACTLY once across the
    // three file batches (ValueState guard), and the emitted set must
    // equal the batch DISTINCT whatever batch first carried each key.
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = events0001
      val srcDir = stageChunks(events)
      val stream = spark.readStream
        .schema(events.select("user_id", "ts", "event_type", "value").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString)
      val q = graft.streaming.StateV2.firstArrivals(stream).toDF()
        .writeStream.format("memory").queryName("det_state_v2")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(180000) finally q.stop()
      val got = spark.table("det_state_v2")
      val expected = events.select("user_id", "event_type").distinct()
      assert(got.count() == expected.count(),
        "first-arrival emitted a key more or less than once")
      assert(expected.exceptAll(got).count() == 0 &&
        got.exceptAll(expected).count() == 0,
        "first-arrival set diverges from batch DISTINCT")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("timer-based sessions over 3 batches equal batch sessionization") {
    // the state-v2 timer path of the same algebra (st_timer_sessions):
    // mid-stream session closes must fire from REGISTERED TIMERS as the
    // watermark advances between file batches, and the closed-session
    // set must still match batch sessionization.
    import spark.implicits._
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = events0001
      val srcDir = stageChunks(events)
      val stream = spark.readStream
        .schema(events.select("user_id", "ts", "event_type", "value").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString)
        .as[EventStreams.Event]
      val q = graft.streaming.StateV2.timerSessions(stream,
          gapSeconds = 21600L, watermark = "0 seconds").toDF()
        .writeStream.format("memory").queryName("det_timer_sessions")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(180000) finally q.stop()

      events.createOrReplaceTempView("det_events")
      val expected = spark.sql(
        """WITH g AS (SELECT user_id, ts, event_id,
          |             CAST(round(value * 100) AS BIGINT) AS cents,
          |             lag(ts) OVER (PARTITION BY user_id
          |                           ORDER BY ts, event_id) AS prev
          |           FROM det_events),
          |s AS (SELECT *, CASE WHEN prev IS NULL OR
          |        unix_micros(ts) - unix_micros(prev) > 21600000000
          |        THEN 1 ELSE 0 END AS new_sess FROM g),
          |sid AS (SELECT *, sum(new_sess) OVER
          |          (PARTITION BY user_id ORDER BY ts, event_id
          |           ROWS UNBOUNDED PRECEDING) AS session_id FROM s),
          |sess AS (SELECT user_id, min(ts) AS session_start,
          |           max(ts) AS session_end, count(*) AS n_events,
          |           sum(cents) AS value_cents
          |         FROM sid GROUP BY user_id, session_id),
          |mx AS (SELECT user_id, max(ts) AS mx FROM det_events GROUP BY user_id)
          |SELECT sess.user_id, session_start, session_end, n_events, value_cents
          |FROM sess JOIN mx ON sess.user_id = mx.user_id
          |WHERE session_end < mx""".stripMargin)

      val lastTs = events.groupBy(col("user_id")).agg(max(col("ts")).as("_mx"))
      val got = spark.table("det_timer_sessions").join(lastTs, "user_id")
        .filter(col("session_end") < col("_mx"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("value_cents"))

      val missing = expected.exceptAll(got).count()
      val extra = got.exceptAll(expected).count()
      assert(expected.count() > 0, "oracle produced no closed sessions")
      assert(missing == 0 && extra == 0,
        s"timer-session sets diverge: missing=$missing extra=$extra")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("foreachBatch upsert over 3 batches equals the batch max_by") {
    // the cross-batch MERGE leg: keys recur across the 3 time-ordered
    // file batches, so the store.merge comparator (not just insert)
    // decides the final rows; the result must equal the batch
    // last-row-per-key reduction regardless of batching.
    import spark.implicits._
    val events = events0001
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
    val srcDir = stageChunksKeep(events)
    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
    val got = graft.streaming.ForeachBatchUpsert.run(stream)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val expected = events
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts").as("last_ts"), col("cents").as("last_cents"))
    assert(expected.count() > 0)
    assert(expected.exceptAll(got).count() == 0 &&
      got.exceptAll(expected).count() == 0,
      "foreachBatch upsert table diverges from batch max_by")
  }

  test("embedding-drift state over 3 file batches equals the batch fold") {
    // st_embedding_drift's Complete-mode state is per-label
    // (count, Σ micro-cosine) long sums — batching-independent by
    // construction; this pins it: the same new-vector rows split into
    // 3 file batches must land the identical (n_new, nsum) state the
    // one-batch gate run and the batch-side fold produce.
    val n = graft.queries.DedupQueries
      .normalizedEmbeddings(spark, "/root/testdata/sf0.001")
    val ex = n.filter(col("vec_id") % 5 =!= 4)
    val nw = n.filter(col("vec_id") % 5 === 4)
    val cu = graft.queries.StreamingQueries.labelCentroids(ex)
      .localCheckpoint(true) // 4 consumers: batch fold + 3 micro-batches
    val newAn = nw.select(col("vec_id"), col("label"), col("an"))

    val srcDir = Files.createTempDirectory("stream-drift-src-")
    val chunked = newAn.withColumn("_chunk",
      ntile(3).over(Window.orderBy(col("vec_id"))))
    (1 to 3).foreach { i =>
      val tmp = Files.createTempDirectory(s"stream-drift-chunk$i-")
      chunked.filter(col("_chunk") === i).select(col("label"), col("an"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val dst = srcDir.resolve(f"chunk_$i%02d.parquet")
      Files.move(onePartFile(tmp), dst)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1700000000000L + i * 10000L))
    }
    val stream = spark.readStream
      .schema(newAn.select(col("label"), col("an")).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
    val agg = graft.queries.StreamingQueries
      .driftScoreAgg(stream, cu, "n_new", "nsum")
    val q = agg.writeStream.format("memory").queryName("det_drift")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(180000) finally q.stop()

    val got = spark.table("det_drift")
    val expected = graft.queries.StreamingQueries
      .driftScoreAgg(newAn, cu, "n_new", "nsum")
    assert(expected.count() > 0)
    assert(expected.exceptAll(got).count() == 0 &&
      got.exceptAll(expected).count() == 0,
      "drift state diverges from the batch fold under 3-batch replay")
  }
}
