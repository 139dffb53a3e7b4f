package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import graft.streaming.EventStreams.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class EventStreamsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("centsOf matches Spark round(x*100) exactly, including negative halves") {
    import org.apache.spark.sql.functions.{col, round}
    // Exact ±.5-cent doubles (x.x25 / x.x75 are representable halves
    // after ×100) are where Java's math.round (floor(x+0.5) — toward
    // +inf) and Spark/DuckDB HALF_UP (away from zero) diverge:
    // round(-112.5) must be -113, where math.round gives -112. The
    // engine's batch cents, the streaming centsOf, and the oracle must
    // agree on every one of these.
    val vals = Seq(1.125, -1.125, 2.375, -2.375, 0.125, -0.125,
      1.005, -1.005, 327.53, -327.53, 0.0, 99.999, -99.999)
    val sparkCents = vals.toDF("v")
      .select(round(col("v") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(vals.map(EventStreams.centsOf) == sparkCents,
      vals.zip(vals.map(EventStreams.centsOf)).zip(sparkCents).toString)
    assert(EventStreams.centsOf(-1.125) == -113L) // away from zero
    assert(math.round(-1.125 * 100) == -112L) // the bug centsOf avoids
  }

  test("windowedCounts on a streaming source matches the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val events = Seq(
      Event(1L, ts("2024-01-01 00:10:00"), "click", 1.5),
      Event(1L, ts("2024-01-01 00:40:00"), "click", 2.0),
      Event(2L, ts("2024-01-01 01:10:00"), "view", 0.5),
      Event(1L, ts("2024-01-01 01:20:00"), "click", 1.0))
    input.addData(events: _*)

    val q = EventStreams.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("wc")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    val batch = EventStreams.windowedCounts(events.toDF())
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(streamed == batch)
    assert(streamed == Seq(
      ("2024-01-01 00:00:00.0", "click", 2L, 350L),
      ("2024-01-01 01:00:00.0", "click", 1L, 100L),
      ("2024-01-01 01:00:00.0", "view", 1L, 50L)))
  }

  test("windowedCounts over a parquet file stream (Trigger.AvailableNow)") {
    // file streams need a directory — stage the parquet into one
    val srcDir = java.nio.file.Files.createTempDirectory("stream-src-")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      srcDir.resolve("events.parquet"))
    val src = srcDir.toString
    val batchDf = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("ts", "event_type", "value")
    // stream it the same way Tables.load reads it — footer schema plus the
    // encoding-adaptive ts normalization (nanos-as-long or timestamp[us])
    val rawBatch = spark.read.parquet(src)
    val stream = graft.Tables.normalizeTs(
      spark.readStream
        .schema(rawBatch.schema)
        .parquet(src),
      statsSide = Some(() => rawBatch), source = src)
      .select("ts", "event_type", "value")
    val q = EventStreams.windowedCounts(stream, "1 day", "1 day")
      .writeStream.format("memory").queryName("wc_file")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.table("wc_file").orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val batch = EventStreams.windowedCounts(batchDf, "1 day", "1 day")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming exact dedup: watermarked dropDuplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = input.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "ts")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1L, ts("2024-01-01 00:00:00"), "click", 1.0),
        Event(1L, ts("2024-01-01 00:00:00"), "click", 1.0), // dup in batch
        Event(2L, ts("2024-01-01 00:05:00"), "view", 2.0))
      q.processAllAvailable()
      // duplicate arriving in a later batch, inside the watermark
      input.addData(Event(1L, ts("2024-01-01 00:00:00"), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("dedup_stream").count() == 2)
  }

  test("dedupKeysWithinWatermark bounds state: key re-emits after eviction") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = EventStreams.dedupKeysWithinWatermark(
      input.toDF(), "1 hour", "user_id", "event_type")
    val q = deduped.writeStream.format("memory").queryName("wm_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1L, ts("2024-01-01 00:00:00"), "click", 1.0),
        Event(1L, ts("2024-01-01 00:10:00"), "click", 1.0)) // dup, in window
      q.processAllAvailable()
      // advance the watermark to 05:00 — evicts key (1, click), whose
      // state expired at 01:00. This is the bounded-state guarantee.
      input.addData(Event(2L, ts("2024-01-01 06:00:00"), "view", 2.0))
      q.processAllAvailable()
      // same key after eviction: emits AGAIN (documented trade-off —
      // exact-distinct parity holds only within the watermark window)
      input.addData(Event(1L, ts("2024-01-01 06:30:00"), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("wm_dedup").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows.count(_ == (1L, "click")) == 2, rows)
    assert(rows.count(_ == (2L, "view")) == 1, rows)
  }

  test("stream-static join enriches events against a static dimension") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val joined = input.toDF().join(dim, Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1L, ts("2024-01-01 00:00:00"), "click", 1.0),
        Event(3L, ts("2024-01-01 00:01:00"), "view", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enriched")
      .collect().map(r => r.getLong(0) -> Option(r.getString(4))).toMap
    assert(rows(1L).contains("gold"))
    assert(rows(3L).isEmpty) // unmatched user → null tier
  }

  test("stream-stream interval join: purchases within 30min of a click") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val c = clicks.toDF().selectExpr("user_id AS c_user", "ts AS c_ts")
      .withWatermark("c_ts", "1 hour")
    val b = buys.toDF().selectExpr("user_id AS b_user", "ts AS b_ts",
        "value AS amount")
      .withWatermark("b_ts", "1 hour")
    val joined = c.join(b,
      org.apache.spark.sql.functions.expr(
        """c_user = b_user AND
           b_ts >= c_ts AND b_ts <= c_ts + INTERVAL 30 MINUTES"""))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Event(1L, ts("2024-01-01 10:00:00"), "click", 0.0))
      buys.addData(
        Event(1L, ts("2024-01-01 10:10:00"), "purchase", 9.5), // in window
        Event(1L, ts("2024-01-01 11:30:00"), "purchase", 3.0), // too late
        Event(2L, ts("2024-01-01 10:05:00"), "purchase", 1.0)) // other user
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ss_join").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("amount") == 9.5)
  }

  test("sessionize emits gap-separated sessions as the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapSeconds = 1800,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // session 1: two events 10 min apart; session 2 after a 2h gap
      input.addData(
        Event(7L, ts("2024-01-01 00:00:00"), "click", 1.0),
        Event(7L, ts("2024-01-01 00:10:00"), "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(7L, ts("2024-01-01 02:10:00"), "click", 3.0))
      q.processAllAvailable()
      // push the watermark far ahead so the open session times out
      input.addData(Event(8L, ts("2024-01-02 00:00:00"), "click", 0.25))
      q.processAllAvailable()
      input.addData(Event(9L, ts("2024-01-03 00:00:00"), "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(10L, ts("2024-01-04 00:00:00"), "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val sessions = spark.table("sessions").as[Session]
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    val u7 = sessions.filter(_.user_id == 7L)
    assert(u7.length == 2)
    assert(u7(0).n_events == 2 && u7(0).value_cents == 300L)
    assert(u7(0).session_start == ts("2024-01-01 00:00:00"))
    assert(u7(0).session_end == ts("2024-01-01 00:10:00"))
    assert(u7(1).n_events == 1 && u7(1).value_cents == 300L)
    val u8 = sessions.filter(_.user_id == 8L)
    assert(u8.length == 1 && u8(0).value_cents == 25L)
  }

  test("late-but-within-watermark event extends the session start backwards") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapSeconds = 1800,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(11L, ts("2024-01-01 01:00:00"), "click", 1.0))
      q.processAllAvailable()
      // arrives a micro-batch later with an EARLIER timestamp (within
      // the 2h watermark): must merge AND lower the session start —
      // parity with batch sessionization (rel_sessionize)
      input.addData(Event(11L, ts("2024-01-01 00:50:00"), "view", 2.0))
      q.processAllAvailable()
      // advance the watermark past the session timeout, then trip it
      input.addData(Event(12L, ts("2024-01-02 00:00:00"), "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(13L, ts("2024-01-03 00:00:00"), "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val u11 = spark.table("late_sessions").as[Session]
      .collect().filter(_.user_id == 11L)
    assert(u11.length == 1)
    assert(u11(0).n_events == 2 && u11(0).value_cents == 300L)
    assert(u11(0).session_start == ts("2024-01-01 00:50:00"))
    assert(u11(0).session_end == ts("2024-01-01 01:00:00"))
  }

  test("sessionize runs on the RocksDB state store (the scale state path)") {
    // HDFS-backed state lives on the executor heap — fine for bounded
    // key spaces, an OOM risk at 100-TB key cardinality. RocksDB keeps
    // state off-heap/on-disk; this pins that the engine's custom-state
    // operator runs on it unchanged and that the provider really engaged.
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = EventStreams.sessionize(input.toDS(), gapSeconds = 1800,
          watermark = "0 seconds")
        .writeStream.format("memory").queryName("rocks_sessions")
        .outputMode(OutputMode.Append).start()
      val rocksEngaged = try {
        input.addData(
          Event(31L, ts("2024-01-01 00:00:00"), "click", 1.0),
          Event(31L, ts("2024-01-01 00:10:00"), "view", 2.0))
        q.processAllAvailable()
        input.addData(Event(31L, ts("2024-01-01 02:10:00"), "click", 3.0))
        q.processAllAvailable()
        input.addData(Event(32L, ts("2024-01-02 00:00:00"), "click", 0.5))
        q.processAllAvailable()
        input.addData(Event(33L, ts("2024-01-03 00:00:00"), "click", 0.0))
        q.processAllAvailable()
        q.recentProgress.flatMap(_.stateOperators).exists(
          _.customMetrics.keySet.stream.anyMatch(_.contains("rocksdb")))
      } finally q.stop()
      assert(rocksEngaged, "no rocksdb state-operator metrics — provider not used")
      val u31 = spark.table("rocks_sessions").as[Session]
        .collect().filter(_.user_id == 31L).sortBy(_.session_start.getTime)
      assert(u31.length == 2, u31.toSeq)
      assert(u31(0).n_events == 2 && u31(0).value_cents == 300L)
      assert(u31(1).n_events == 1 && u31(1).value_cents == 300L)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("late event older than start-gap becomes its own session, not a merge") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapSeconds = 1800,
        watermark = "4 hours")
      .writeStream.format("memory").queryName("too_old_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(21L, ts("2024-01-01 02:00:00"), "click", 1.0))
      q.processAllAvailable()
      // 2h older than the open session's start: batch sessionization
      // would gap-split these; the stream must NOT merge them
      input.addData(Event(21L, ts("2024-01-01 00:00:00"), "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(22L, ts("2024-01-02 00:00:00"), "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(23L, ts("2024-01-03 00:00:00"), "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val u21 = spark.table("too_old_sessions").as[Session]
      .collect().filter(_.user_id == 21L)
      .sortBy(_.session_start.getTime)
    assert(u21.length == 2, u21.toSeq)
    assert(u21(0).n_events == 1 && u21(0).value_cents == 200L)
    assert(u21(0).session_start == ts("2024-01-01 00:00:00"))
    assert(u21(1).n_events == 1 && u21(1).value_cents == 100L)
    assert(u21(1).session_start == ts("2024-01-01 02:00:00"))
  }
}
