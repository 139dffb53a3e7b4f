package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, ValueState}

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

object StateV2 {

  /** Distinct (user_id, event_type) pairs via first-arrival emission —
    * see [[FirstArrivalProcessor]]. Input must have those two columns. */
  def firstArrivals(events: Dataset[_]): Dataset[KeyPair] = {
    implicit val enc = Encoders.product[KeyPair]
    events.select("user_id", "event_type").as[KeyPair]
      .groupByKey(identity)
      .transformWithState(
        new FirstArrivalProcessor, TimeMode.None(), OutputMode.Append())
  }
}
