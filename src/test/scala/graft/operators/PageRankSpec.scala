package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins PageRank.run's exact integer-token semantics on graphs small
  * enough to hand-compute: share = tokens div deg along every out-edge,
  * refresh = 150000 + (85 * received) div 100, dangling nodes send
  * nothing. These are the invariants the rel_graph_pagerank oracle
  * replays — a drift here would surface as a cross-engine hash mismatch.
  */
class PageRankSpec extends AnyFunSuite with SparkTestSession {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def tokensOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("directed cycle is a fixed point at initTokens") {
    // deg=1 everywhere: t' = 150000 + 85% of 1_000_000 = 1_000_000
    val g = edges(1L -> 2L, 2L -> 3L, 3L -> 1L)
    for (iters <- Seq(1, 3)) {
      val out = tokensOf(PageRank.run(g, iters))
      assert(out == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    }
  }

  test("undirected star, one round, hand-computed floors") {
    // center 0 <-> leaves 1,2,3. deg(0)=3, deg(leaf)=1.
    // center receives 3*1e6 -> 150000 + 85*3e6 div 100 = 2_700_000
    // leaf receives floor(1e6/3)=333333
    //   -> 150000 + (85*333333) div 100 = 150000 + 283333 = 433333
    val g = edges(0L -> 1L, 0L -> 2L, 0L -> 3L,
      1L -> 0L, 2L -> 0L, 3L -> 0L)
    val out = tokensOf(PageRank.run(g, 1))
    assert(out == Map(0L -> 2700000L, 1L -> 433333L,
      2L -> 433333L, 3L -> 433333L))
  }

  test("dangling node keeps receiving but sends nothing") {
    // 1 -> 2 only: node 2 is dangling. After round 1:
    //   t(1) = 150000 (receives nothing)
    //   t(2) = 150000 + 850000 = 1_000_000
    // After round 2: t(2) = 150000 + 85*150000 div 100 = 277500
    val g = edges(1L -> 2L)
    assert(tokensOf(PageRank.run(g, 1)) ==
      Map(1L -> 150000L, 2L -> 1000000L))
    assert(tokensOf(PageRank.run(g, 2)) ==
      Map(1L -> 150000L, 2L -> 277500L))
  }

  test("zero iterations returns the uniform init") {
    val out = tokensOf(PageRank.run(edges(1L -> 2L, 2L -> 1L), 0))
    assert(out == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("duplicate edges carry multigraph weight") {
    // two parallel 1->2 edges and one 2->1: deg(1)=2 so each edge
    // carries 500_000; node 2 receives 1_000_000 total.
    val g = edges(1L -> 2L, 1L -> 2L, 2L -> 1L)
    val out = tokensOf(PageRank.run(g, 1))
    assert(out(2L) == 1000000L)
    assert(out(1L) == 1000000L)
  }
}
