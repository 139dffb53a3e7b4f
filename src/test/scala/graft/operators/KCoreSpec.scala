package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins KCore's synchronous peel against a driver-side replay — in
  * particular the MULTI-ROUND cascades the registry graph's bimodal
  * degrees can't exhibit (there, peeling converges after one round;
  * here, paths and lollipops peel one layer per round). */
class KCoreSpec extends AnyFunSuite with SparkTestSession {

  /** Undirected helper: both directions from a canonical pair list. */
  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int)
      : Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    val und = e.unionAll(e.select(e("dst").as("src"), e("src").as("dst")))
    KCore.run(und, k, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side oracle of the same synchronous semantics. */
  private def naive(edges: Seq[(Long, Long)], k: Int, rounds: Int)
      : Map[Long, Long] = {
    val und = edges ++ edges.map(_.swap)
    var alive = und.map(_._1).toSet
    for (_ <- 1 to rounds) {
      val deg = und.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (id, es) => id -> es.size }
      alive = deg.filter(_._2 >= k).keySet
    }
    und.filter(e => alive(e._1) && alive(e._2))
      .groupBy(_._1).map { case (id, es) => id -> es.size.toLong }
  }

  test("path peels one endpoint layer per round at k=2") {
    // P6: 1-2-3-4-5-6. Round 1 drops {1,6}, round 2 drops {2,5},
    // round 3 drops {3,4} — empty. Synchronous rounds are observable.
    val p6 = (1L to 5L).map(i => (i, i + 1))
    assert(run(p6, 2, 1).keySet == Set(2L, 3L, 4L, 5L))
    assert(run(p6, 2, 2).keySet == Set(3L, 4L))
    assert(run(p6, 2, 3).isEmpty)
    assert(run(p6, 2, 2) == naive(p6, 2, 2))
  }

  test("lollipop: clique core survives, tail cascades away") {
    // K4 on {1,2,3,4} + tail 4-5-6-7. k=2: tail peels from 7 inward
    // one vertex per round; the clique (and vertex 4) never drops.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    assert(run(e, 2, 1).keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(run(e, 2, 3).keySet == Set(1L, 2L, 3L, 4L))
    // reported degrees are the induced degrees of the survivor set
    assert(run(e, 2, 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(run(e, 2, 3) == naive(e, 2, 3))
  }

  test("k=1 keeps every non-isolated vertex; high k empties the graph") {
    val e = Seq((1L, 2L), (2L, 3L))
    assert(run(e, 1, 3).keySet == Set(1L, 2L, 3L))
    assert(run(e, 10, 2).isEmpty)
  }

  test("seeded random graphs match the driver oracle across rounds") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 25 + trial * 10
      val e = (1 to n * 3).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      for (rounds <- 1 to 3)
        assert(run(e, 3, rounds) == naive(e, 3, rounds),
          s"trial $trial rounds $rounds")
    }
  }
}
