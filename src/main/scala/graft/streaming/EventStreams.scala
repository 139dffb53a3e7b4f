package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user session accumulator for [[EventStreams.sessionize]] —
  * top-level so the state Encoder's generated code can instantiate it. */
final case class SessionState(startUs: Long, lastUs: Long, n: Long, cents: Long)

/** Structured Streaming layer over the `events` table shape (TESTDATA.md):
  * the reference is batch-only (SURVEY.md §2.5), so this is the engine's
  * streaming extension path — the same logical operators expressed as an
  * unbounded plan: watermarked windowed aggregation for the declarative
  * case, flatMapGroupsWithState for custom session state.
  *
  * Both transforms accept batch or streaming inputs — Spark resolves them
  * to either Aggregate or StatefulOperator physical plans — so batch
  * parity tests can compare streaming output to the batch equivalent on
  * the same rows.
  */
object EventStreams {

  final case class Event(
      user_id: Long, ts: Timestamp, event_type: String, value: Double)

  /** Scala-side money rounding, identical to the batch engine's
    * `round(x*100)` (Spark Round on double = decimal HALF_UP, away from
    * zero on ±.5) and the DuckDB oracle. Java's `math.round` is
    * floor(x+0.5) — half-toward-+inf — which diverges on negative
    * *.5-cent values, so never use it for cents. */
  private[graft] def centsOf(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      value_cents: Long)

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * state: the streaming analogue of the batch groupBy/agg (A-class
    * operators). Late data beyond `watermark` is dropped, so state is
    * O(active windows), not O(stream). */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_cents"))

  /** Watermark-bounded streaming dedup — the 100-TB state path. Plain
    * `dropDuplicates` keeps one state entry per distinct key FOREVER
    * (state grows with the stream; on an unbounded 100-TB key stream it
    * eventually spills every store). `dropDuplicatesWithinWatermark`
    * instead evicts a key's state once the event-time watermark passes
    * its first-seen time + `watermark`, so state is O(keys active within
    * one watermark window). Semantics trade-off, pinned by
    * EventStreamsSpec: two occurrences of a key farther apart than the
    * watermark BOTH emit (batch-distinct parity holds only within the
    * window — or exactly, when the watermark exceeds the stream's time
    * span, which is how st_dedup_watermark is oracle-checked). */
  def dedupKeysWithinWatermark(events: DataFrame, watermark: String,
      keys: String*): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)
      .select(keys.map(col): _*)

  /** Gap-based sessionization with explicit state: events for a user
    * belong to one session while consecutive gaps stay under `gapSeconds`.
    * Sessions are emitted when the event-time watermark passes the gap
    * (timeout) — state per user is O(1). */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
      watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L

    def us(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // µs-precise Timestamp (events carry µs components; a plain
          // new Timestamp(us/1000) would truncate to ms and diverge from
          // the batch sessionization of the same rows)
          def tsOf(usv: Long): Timestamp = {
            val t = new Timestamp(Math.floorDiv(usv, 1000000L) * 1000L)
            t.setNanos((Math.floorMod(usv, 1000000L) * 1000L).toInt)
            t
          }

          def emit(s: SessionState): Session =
            Session(userId, tsOf(s.startUs), tsOf(s.lastUs), s.n, s.cents)

          if (state.hasTimedOut) {
            val out = state.getOption.map(emit).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_type))
            var current = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = us(e.ts)
              val cents = centsOf(e.value)
              current match {
                case Some(s) if t >= s.startUs - gapUs && t - s.lastUs <= gapUs =>
                  // min() on start: a late-but-within-watermark event from
                  // an earlier micro-batch must extend the session backwards
                  // too, or streaming output diverges from batch
                  // sessionization (rel_sessionize). Gap checks ACROSS
                  // batches remain approximate for out-of-order arrivals:
                  // the events of an already-started state are not re-split.
                  current = Some(SessionState(math.min(s.startUs, t),
                    math.max(s.lastUs, t), s.n + 1, s.cents + cents))
                case Some(s) if t < s.startUs - gapUs =>
                  // too old to bridge to the open session (batch would put
                  // it in an earlier, gap-separated session): emit it as
                  // its own closed singleton, keep the open session as-is.
                  // Approximate: a yet-later arrival that would have
                  // bridged or extended it cannot reopen it.
                  closed += emit(SessionState(t, t, 1, cents))
                case Some(s) =>
                  closed += emit(s)
                  current = Some(SessionState(t, t, 1, cents))
                case None =>
                  current = Some(SessionState(t, t, 1, cents))
              }
            }
            current.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapSeconds * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
