package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the memory-sink lifetime contract in
  * [[graft.queries.StreamingQueries]]' `runToMemory`: each run's sink
  * rows live exactly as long as the CALLER's returned DataFrame — the
  * `graft_stream_N` temp view is dropped before the frame is handed
  * back (analysis is forced first, so the resolved plan survives the
  * drop). Leaving the views registered pinned every run's full result
  * on the driver heap for the JVM's lifetime — unbounded across a
  * cold+warm sweep of the 22-query family, and the measured cause of
  * the StreamStress 50× executor OOM (~40 sinks deep, round 11). */
class StreamSinkLifecycleSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("a streaming registry run leaves no sink temp view behind") {
    val before = spark.catalog.listTables().collect()
      .map(_.name).count(_.startsWith("graft_stream_"))
    val out = SparkEntry.queries("st_window_agg")(spark, dir)
    val n = out.count()
    assert(n > 0)
    val after = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_stream_"))
    assert(after.isEmpty,
      s"sink temp views leaked (held rows pinned JVM-wide): " +
        s"${after.mkString(", ")} (before: $before)")
  }

  test("the returned frame stays consumable after the view drop") {
    val out = SparkEntry.queries("st_window_agg")(spark, dir)
    // two actions + a derived frame: the resolved plan must not depend
    // on the dropped catalog entry
    assert(out.count() == out.count())
    assert(out.select(out.columns.map(org.apache.spark.sql.functions.col): _*)
      .count() == out.count())
  }
}
