package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, ValueState}

/** Spark 4's arbitrary-stateful-processing v2 surface
  * (`transformWithState` + [[StatefulProcessor]]): typed per-key state
  * handles (ValueState/ListState/MapState), TTL, and timers over the
  * RocksDB state store — the successor API to
  * (flat)mapGroupsWithState and the layer the engine's custom
  * streaming state would target on current Spark.
  *
  * The demonstration keeps BATCHING-INDEPENDENT semantics (the
  * discipline every st_* query follows): first-arrival key emission —
  * a key is emitted exactly once, on the micro-batch that first sees
  * it, guarded by a per-key ValueState[Boolean]. Whatever the file
  * batching, the emitted SET is exactly the distinct key set, so the
  * batch oracle is `SELECT DISTINCT …`. State is one boolean per
  * distinct key (bounded by key cardinality, TTL-able for unbounded
  * key spaces).
  */
final case class KeyPair(user_id: Long, event_type: String)

/** Emits each key once on first arrival; drops every later occurrence. */
class FirstArrivalProcessor
    extends StatefulProcessor[KeyPair, KeyPair, KeyPair] {

  @transient private var seen: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Boolean](
      "seen", Encoders.scalaBoolean, TTLConfig.NONE)

  override def handleInputRows(
      key: KeyPair,
      rows: Iterator[KeyPair],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[KeyPair] =
    if (seen.exists()) Iterator.empty
    else {
      seen.update(true)
      Iterator.single(key)
    }
}

/** Gap sessionization on the v2 API: the same algorithm as
  * [[EventStreams.sessionize]] (per-batch sort, gap split, cross-batch
  * merge through the session ValueState) with the GroupStateTimeout
  * replaced by EXPLICIT event-time timers — register at
  * last_ts + gap on every update (deleting the stale timer, tracked in
  * its own ValueState), emit-and-clear in [[handleExpiredTimer]] when
  * the watermark passes it. Semantics match the v1 sessionizer
  * batch-for-batch, so st_timer_sessions shares st_sessionize's oracle
  * and its last-session exclusion discipline.
  */
class TimerSessionProcessor(gapSeconds: Long)
    extends StatefulProcessor[Long, EventStreams.Event, EventStreams.Session] {

  private val gapUs = gapSeconds * 1000000L
  @transient private var sess: ValueState[SessionState] = _
  @transient private var timer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    sess = getHandle.getValueState[SessionState](
      "session", Encoders.product[SessionState], TTLConfig.NONE)
    timer = getHandle.getValueState[Long](
      "timer", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def us(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  // µs-precise Timestamp reconstruction (same rationale as sessionize)
  private def tsOf(usv: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(usv, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(usv, 1000000L) * 1000L).toInt)
    t
  }

  private def emit(userId: Long, s: SessionState): EventStreams.Session =
    EventStreams.Session(userId, tsOf(s.startUs), tsOf(s.lastUs), s.n, s.cents)

  override def handleInputRows(
      userId: Long,
      rows: Iterator[EventStreams.Event],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[EventStreams.Session] = {
    val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_type))
    var current = Option(sess.get())
    val closed = Seq.newBuilder[EventStreams.Session]
    sorted.foreach { e =>
      val t = us(e.ts)
      val cents = EventStreams.centsOf(e.value)
      current match {
        case Some(s) if t >= s.startUs - gapUs && t - s.lastUs <= gapUs =>
          current = Some(SessionState(math.min(s.startUs, t),
            math.max(s.lastUs, t), s.n + 1, s.cents + cents))
        case Some(s) if t < s.startUs - gapUs =>
          closed += emit(userId, SessionState(t, t, 1, cents))
        case Some(s) =>
          closed += emit(userId, s)
          current = Some(SessionState(t, t, 1, cents))
        case None =>
          current = Some(SessionState(t, t, 1, cents))
      }
    }
    current.foreach { s =>
      sess.update(s)
      val expiryMs = s.lastUs / 1000L + gapSeconds * 1000L
      if (timer.exists() && timer.get() != expiryMs)
        getHandle.deleteTimer(timer.get())
      getHandle.registerTimer(expiryMs)
      timer.update(expiryMs)
    }
    closed.result().iterator
  }

  override def handleExpiredTimer(
      userId: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[EventStreams.Session] = {
    val out = Option(sess.get()).map(emit(userId, _)).toSeq
    sess.clear()
    timer.clear()
    out.iterator
  }
}

/** Per-session event-type breakdown row emitted at session close. */
final case class SessionTypeCount(
    user_id: Long,
    session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp,
    event_type: String,
    n: Long)

/** The MAPSTATE leg of the v2 surface: the session algebra of
  * [[TimerSessionProcessor]] with a per-key `MapState[event_type →
  * count]` accumulating the OPEN session's type histogram — per-type
  * counts live as individual state-store entries (point updates, no
  * read-modify-write of a whole map blob), which is the reason
  * MapState exists over a ValueState[Map]. On close (in-batch gap or
  * timer expiry) the histogram drains as one row per type and the map
  * clears for the next session.
  *
  * Within one micro-batch the per-row increments accumulate in a local
  * JVM map and flush to MapState ONCE per distinct type at the end of
  * `handleInputRows` — a per-row containsKey/getValue/updateValue
  * triple is three serializing state-store calls (RocksDB JNI each)
  * per input row, and batching them behind the store cut the
  * registry query's micro-batch time ~2× with identical state: the
  * MapState remains the only CROSS-batch carrier, the buffer never
  * outlives the call, and every drain path merges store + buffer
  * before emitting.
  */
class SessionTypeCountsProcessor(gapSeconds: Long)
    extends StatefulProcessor[Long, EventStreams.Event, SessionTypeCount] {

  private val gapUs = gapSeconds * 1000000L
  @transient private var sess: ValueState[SessionState] = _
  @transient private var counts: MapState[String, Long] = _
  @transient private var timer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    sess = getHandle.getValueState[SessionState](
      "session", Encoders.product[SessionState], TTLConfig.NONE)
    counts = getHandle.getMapState[String, Long](
      "type_counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    timer = getHandle.getValueState[Long](
      "timer", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def us(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def tsOf(usv: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(usv, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(usv, 1000000L) * 1000L).toInt)
    t
  }

  /** Batch-local overlay of the open session's histogram; flushed to
    * [[counts]] once per `handleInputRows` call, merged by every drain.
    * Never read by the timer path (the flush precedes every return). */
  @transient private lazy val pending =
    scala.collection.mutable.LinkedHashMap[String, Long]()

  private def bump(tpe: String): Unit =
    pending.update(tpe, pending.getOrElse(tpe, 0L) + 1L)

  private def flushPending(): Unit = {
    pending.foreach { case (tpe, delta) =>
      counts.updateValue(tpe,
        (if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L) + delta)
    }
    pending.clear()
  }

  private def drain(userId: Long, s: SessionState): Seq[SessionTypeCount] = {
    val merged = scala.collection.mutable.LinkedHashMap[String, Long]()
    counts.iterator().foreach { case (tpe, n) => merged.update(tpe, n) }
    pending.foreach { case (tpe, d) =>
      merged.update(tpe, merged.getOrElse(tpe, 0L) + d)
    }
    pending.clear()
    val out = merged.map { case (tpe, n) =>
      SessionTypeCount(userId, tsOf(s.startUs), tsOf(s.lastUs), tpe, n)
    }.toSeq
    counts.clear()
    out
  }

  override def handleInputRows(
      userId: Long,
      rows: Iterator[EventStreams.Event],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[SessionTypeCount] = {
    val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_type))
    var current = Option(sess.get())
    val closed = Seq.newBuilder[SessionTypeCount]
    sorted.foreach { e =>
      val t = us(e.ts)
      current match {
        case Some(s) if t >= s.startUs - gapUs && t - s.lastUs <= gapUs =>
          current = Some(SessionState(math.min(s.startUs, t),
            math.max(s.lastUs, t), s.n + 1, 0L))
          bump(e.event_type)
        case Some(s) if t < s.startUs - gapUs =>
          // pre-session straggler: its own singleton session (cannot
          // touch the open session's map)
          closed += SessionTypeCount(userId, tsOf(t), tsOf(t), e.event_type, 1L)
        case Some(s) =>
          closed ++= drain(userId, s)
          current = Some(SessionState(t, t, 1, 0L))
          bump(e.event_type)
        case None =>
          current = Some(SessionState(t, t, 1, 0L))
          bump(e.event_type)
      }
    }
    flushPending() // open session's increments become cross-batch state
    current.foreach { s =>
      sess.update(s)
      val expiryMs = s.lastUs / 1000L + gapSeconds * 1000L
      if (timer.exists() && timer.get() != expiryMs)
        getHandle.deleteTimer(timer.get())
      getHandle.registerTimer(expiryMs)
      timer.update(expiryMs)
    }
    closed.result().iterator
  }

  override def handleExpiredTimer(
      userId: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[SessionTypeCount] = {
    val out = Option(sess.get()).map(drain(userId, _)).getOrElse(Seq.empty)
    sess.clear()
    counts.clear()
    timer.clear()
    out.iterator
  }
}

/** foreachBatch last-writer-wins upsert — the streaming-MERGE-into-
  * warehouse pattern as a testable unit. Each micro-batch is reduced
  * to one row per key (max_by over (ts, event_id)) on the EXECUTORS,
  * bulk-written to a staging table, and folded into the keyed target
  * with ONE set-based `MERGE INTO` executed inside the warehouse —
  * the driver issues a single DDL-sized statement per batch and never
  * sees a data row (no per-key collect, no driver-resident store: at
  * 100 TB with wide key sets the driver holds nothing). The merge
  * keeps the larger (ts, event_id) — idempotent and commutative
  * across batches, so the final table equals the batch reduction
  * whatever the file batching (StreamingDeterminismSpec runs it over
  * 3 file batches).
  *
  * The warehouse is embedded Derby (this sandbox's stand-in for
  * Postgres, as in [[graft.beacon.JdbcStaging]]); in production the
  * same three steps target the real endpoint — reduce, bulk-stage,
  * MERGE — which is exactly the Delta/Iceberg/JDBC upsert discipline.
  */
object ForeachBatchUpsert {

  /** Run `stream` (user_id, event_id, ts, cents) to completion under
    * AvailableNow, MERGEing each micro-batch into a fresh warehouse
    * table; returns the final committed table as
    * (user_id, last_event_id, last_ts, last_cents). */
  def run(stream: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = stream.sparkSession
    val db = "graftfeb" + java.util.UUID.randomUUID().toString.replace("-", "")
    val url = s"jdbc:derby:memory:$db;create=true"
    def exec(sql: String): Unit = {
      val c = java.sql.DriverManager.getConnection(url)
      try { c.createStatement().executeUpdate(sql); () } finally c.close()
    }
    // identifiers quoted: Derby uppercases bare names, and the
    // read-back column names must match the oracle's lower-case schema
    exec("""CREATE TABLE target (
           |  "user_id" BIGINT PRIMARY KEY,
           |  "last_event_id" BIGINT,
           |  "last_ts" TIMESTAMP,
           |  "last_cents" BIGINT)""".stripMargin)
    val ck = java.nio.file.Files
      .createTempDirectory("graft-feb-ck-").toString
    StateV2.deleteOnExit(ck)
    val q = stream.writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // executor-side per-key reduction, then a distributed bulk
        // write of the reduced rows into the staging table
        batch.groupBy(col("user_id"))
          .agg(max_by(col("event_id"),
              struct(col("ts"), col("event_id"))).as("last_event_id"),
            max(col("ts")).as("last_ts"),
            max_by(col("cents"),
              struct(col("ts"), col("event_id"))).as("last_cents"))
          .write.mode("overwrite")
          .jdbc(url, "stage", new java.util.Properties)
        // one set-based MERGE per batch, evaluated by the warehouse;
        // last-writer-wins on (ts, event_id), ties keep the target
        exec("""MERGE INTO target t USING stage s
               |ON t."user_id" = s."user_id"
               |WHEN MATCHED AND (s."last_ts" > t."last_ts"
               |  OR (s."last_ts" = t."last_ts"
               |      AND s."last_event_id" > t."last_event_id")) THEN
               |  UPDATE SET "last_event_id" = s."last_event_id",
               |    "last_ts" = s."last_ts", "last_cents" = s."last_cents"
               |WHEN NOT MATCHED THEN
               |  INSERT ("user_id", "last_event_id", "last_ts", "last_cents")
               |  VALUES (s."user_id", s."last_event_id", s."last_ts",
               |    s."last_cents")""".stripMargin)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // The COMMITTED table is the result. Snapshot it WITHOUT funneling
    // data through the driver: a predicate-partitioned JDBC read (the
    // only driver-side queries are the O(1-row) bounds probe) spilled
    // straight to a parquet snapshot by executor tasks, after which the
    // in-memory database can be dropped and the result served from
    // parquet. At corpus-sized keyed state this is N parallel range
    // scans + a distributed columnar write; the old collect() was a
    // driver funnel. Predicates are hand-built so the quoted lower-case
    // "user_id" survives into the generated WHERE clauses (Derby
    // uppercases bare identifiers).
    // JVM-locality caveat: the parallel range scans reach an embedded
    // jdbc:derby:memory: database only because local[*] executors share
    // the driver JVM. On a real cluster the same code requires `url` to
    // point at a network-reachable warehouse (any production JDBC
    // endpoint); an in-memory embedded DB is invisible to remote
    // executor JVMs.
    val (lo, hi, n) = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          """SELECT MIN("user_id"), MAX("user_id"), COUNT(*) FROM target""")
        rs.next(); (rs.getLong(1), rs.getLong(2), rs.getLong(3))
      } finally c.close()
    }
    val predicates =
      if (n == 0) Array("1=1")
      else {
        val parts = math.min(8L, math.max(1L, n / 1000)).toInt
        val step = math.max(1L, (hi - lo) / parts + 1)
        Array.tabulate(parts) { i =>
          val a = lo + i * step
          if (i == parts - 1) s""""user_id" >= $a"""
          else s""""user_id" >= $a AND "user_id" < ${a + step}"""
        }
      }
    // the snapshot must OUTLIVE this call (the returned DataFrame reads
    // it lazily), so its lifetime is the JVM's: a shutdown hook reclaims
    // it, bounding the leak a long-lived process would otherwise
    // accumulate one corpus-sized parquet copy per run
    val snap = java.nio.file.Files
      .createTempDirectory("graft-feb-snap-").toString
    StateV2.deleteOnExit(snap)
    spark.read.jdbc(url, "target", predicates, new java.util.Properties)
      .write.mode("overwrite").parquet(snap)
    try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
    catch { case _: java.sql.SQLException => () } // 08006 = success
    spark.read.parquet(snap)
  }
}

object StateV2 {

  /** Recursive temp-dir cleanup at JVM exit (checkpoint and snapshot
    * directories whose contents must outlive the call that made them —
    * a lazily-read snapshot has no earlier safe deletion point). */
  private[streaming] def deleteOnExit(dir: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }))

  /** Distinct (user_id, event_type) pairs via first-arrival emission —
    * see [[FirstArrivalProcessor]]. Input must have those two columns. */
  def firstArrivals(events: Dataset[_]): Dataset[KeyPair] = {
    implicit val enc = Encoders.product[KeyPair]
    events.select("user_id", "event_type").as[KeyPair]
      .groupByKey(identity)
      .transformWithState(
        new FirstArrivalProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Gap sessions via event-time TIMERS — see [[TimerSessionProcessor]].
    * Input must carry a watermark on `ts`. */
  def timerSessions(events: Dataset[EventStreams.Event], gapSeconds: Long,
      watermark: String): Dataset[EventStreams.Session] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val enc = Encoders.product[EventStreams.Session]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(
        new TimerSessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Per-session event-type histograms via MapState — see
    * [[SessionTypeCountsProcessor]]. */
  def sessionTypeCounts(events: Dataset[EventStreams.Event],
      gapSeconds: Long, watermark: String): Dataset[SessionTypeCount] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val enc = Encoders.product[SessionTypeCount]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionTypeCountsProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
