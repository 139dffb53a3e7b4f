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
    // assert on NEW views only (ADVICE r11): suites share one
    // SparkContext, and a concurrent suite momentarily inside
    // runToMemory (between queryName registration and dropTempView)
    // legitimately has a graft_stream_* view live — only a view that
    // appears across THIS run and survives it is a leak
    val before = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_stream_")).toSet
    val out = SparkEntry.queries("st_window_agg")(spark, dir)
    val n = out.count()
    assert(n > 0)
    val leaked = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_stream_")).toSet -- before
    assert(leaked.isEmpty,
      s"sink temp views leaked (held rows pinned JVM-wide): " +
        s"${leaked.mkString(", ")}")
  }

  test("a DSv2-sink registry run leaves no committed-store entry behind") {
    val out = SparkEntry.queries("st_sink_append")(spark, dir)
    val n = out.count()
    assert(n > 0)
    // the connector edition of the same class: runToGraftGen copies the
    // committed rows into a local dataset and must drop the JVM-wide
    // store entry (fresh runSeq table name per run → otherwise every
    // run's vector is retained forever) plus its epoch-ledger keys
    import scala.jdk.CollectionConverters._
    val leftover = graft.sources.GraftGen.committed.keySet().asScala
      .filter(_.startsWith("st_sink_"))
    assert(leftover.isEmpty, s"committed store leaked: $leftover")
    val ledger = graft.sources.GraftGen.committedEpochs.keySet().asScala
      .filter(_.startsWith("st_sink_"))
    assert(ledger.isEmpty, s"epoch ledger leaked: $ledger")
    assert(out.count() == n) // still consumable after the removal
  }

  test("noop-sink mode runs the plan but returns an empty frame of the same schema") {
    // the StreamStress engine-only A/B (VERDICT r11 #1): with
    // spark.graft.stream.sink=noop the full streaming plan still runs
    // (source, state, micro-batch protocol), and only the driver-side
    // collection the oracle harness needs is skipped — observable as
    // an empty result carrying the memory-sink run's exact schema
    val verified = SparkEntry.queries("st_window_agg")(spark, dir)
    assert(verified.count() > 0)
    spark.conf.set("spark.graft.stream.sink", "noop")
    try {
      val engineOnly = SparkEntry.queries("st_window_agg")(spark, dir)
      assert(engineOnly.schema == verified.schema,
        "engine-only mode must keep the query's schema")
      assert(engineOnly.count() == 0,
        "engine-only mode must not collect sink rows")
      // the DSv2-sink leg honors the knob too (noop replaces graftgen)
      val sinkQ = SparkEntry.queries("st_sink_append")(spark, dir)
      assert(sinkQ.count() == 0)
      import scala.jdk.CollectionConverters._
      assert(!graft.sources.GraftGen.committed.keySet().asScala
        .exists(_.startsWith("st_sink_")),
        "noop mode must not populate the connector's committed store")
    } finally spark.conf.unset("spark.graft.stream.sink")
  }

  test("connector mode writes the committed store but skips the read-back (VERDICT r12 #5)") {
    // closes the engine-only lower-bound caveat: st_sink_* numbers in
    // this mode INCLUDE the DSv2 committed-store write (the stand-in
    // for an external system) and skip only driver collection. The
    // store write is observable through the sink's write path having
    // run — and the lifecycle contract still holds: the store entry is
    // dropped before return, the result frame is empty.
    spark.conf.set("spark.graft.stream.sink", "connector")
    try {
      val sinkQ = SparkEntry.queries("st_sink_append")(spark, dir)
      assert(sinkQ.count() == 0,
        "connector mode must not collect the committed rows")
      import scala.jdk.CollectionConverters._
      assert(!graft.sources.GraftGen.committed.keySet().asScala
        .exists(_.startsWith("st_sink_")),
        "connector mode must still drop the store entry (leak class)")
      // memory-sink queries degrade to engine-only under this knob
      val mem = SparkEntry.queries("st_window_agg")(spark, dir)
      assert(mem.count() == 0)
    } finally spark.conf.unset("spark.graft.stream.sink")
  }

  test("digest mode proves row-identity with one collected row per batch (VERDICT r12 #4)") {
    // the executor-side digest leg: same rows as the memory-sink run
    // — provable through an order-insensitive (xxhash-sum, count)
    // digest — with no driver-side row collection. Two runs of the
    // same query must agree digest-for-digest; the verified run's row
    // count must match the digest's count.
    val verified = SparkEntry.queries("st_window_agg")(spark, dir)
    val nVerified = verified.count()
    assert(nVerified > 0)
    def digestRun(): (Long, Long) = {
      import scala.jdk.CollectionConverters._
      val before =
        graft.queries.StreamingQueries.streamDigests.keySet().asScala.toSet
      val out = SparkEntry.queries("st_window_agg")(spark, dir)
      assert(out.count() == 0, "digest mode must not collect sink rows")
      val fresh = graft.queries.StreamingQueries.streamDigests.keySet()
        .asScala.toSet -- before
      assert(fresh.size == 1, s"expected exactly one new digest, got $fresh")
      graft.queries.StreamingQueries.streamDigests.get(fresh.head)
    }
    spark.conf.set("spark.graft.stream.sink", "digest")
    try {
      val (h1, n1) = digestRun()
      val (h2, n2) = digestRun()
      assert(n1 == nVerified,
        s"digest row count $n1 must equal the verified run's $nVerified")
      assert((h1, n1) == (h2, n2),
        "re-running the same query must reproduce the digest bit-for-bit")
    } finally spark.conf.unset("spark.graft.stream.sink")
  }

  test("the returned frame stays consumable after the view drop") {
    val out = SparkEntry.queries("st_window_agg")(spark, dir)
    // two actions + a derived frame: the resolved plan must not depend
    // on the dropped catalog entry
    assert(out.count() == out.count())
    val cols = scala.collection.immutable.ArraySeq
      .unsafeWrapArray(out.columns.map(org.apache.spark.sql.functions.col))
    assert(out.select(cols: _*).count() == out.count())
  }
}
