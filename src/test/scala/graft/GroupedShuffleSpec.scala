package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[GroupedShuffleListener]]'s attribution (VERDICT r9 #2): a
  * query's shuffle bytes bill the job group the driver thread set,
  * never a neighbor's — the round-9 single-counter listener let a heavy
  * query's late task events land in the NEXT query's delta
  * (rel_graph_butterfly: 128 MB in-sweep vs 85 MB single-query).
  */
class GroupedShuffleSpec extends AnyFunSuite with SparkTestSession {

  private def settle(l: GroupedShuffleListener, g: String): Long = {
    var prev = -1L; var cur = l.bytesFor(g); var spins = 0
    while (cur != prev && spins < 40) {
      Thread.sleep(25); prev = cur; cur = l.bytesFor(g); spins += 1
    }
    cur
  }

  test("shuffle bytes bill the owning job group, not neighbors") {
    val listener = new GroupedShuffleListener
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup("bench:shuffler", "shuffler")
      spark.range(200000)
        .selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k").count().collect()
      spark.sparkContext.clearJobGroup()

      spark.sparkContext.setJobGroup("bench:mapper", "mapper")
      spark.range(1000).collect() // shuffle-free
      spark.sparkContext.clearJobGroup()

      assert(settle(listener, "bench:shuffler") > 0L,
        "the aggregating query must bill its own group")
      assert(settle(listener, "bench:mapper") === 0L,
        "a shuffle-free query must not inherit a neighbor's bytes")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("non-bench job groups bill the active fallback query") {
    // a streaming query's micro-batch thread replaces the driver's
    // "bench:…" group with its runId; the listener must route those
    // jobs to the active query instead of zeroing its shuffle
    val listener = new GroupedShuffleListener
    spark.sparkContext.addSparkListener(listener)
    try {
      listener.setActiveFallback("bench:streamish")
      // simulate the stream thread: a job group NOT prefixed "bench:"
      spark.sparkContext.setJobGroup("run-abc-123", "microbatch")
      spark.range(200000)
        .selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k").count().collect()
      spark.sparkContext.clearJobGroup()
      listener.setActiveFallback("")

      assert(settle(listener, "bench:streamish") > 0L,
        "a foreign-group job during a query must bill that query")
      assert(settle(listener, "run-abc-123") === 0L,
        "the foreign group itself must not accumulate")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
