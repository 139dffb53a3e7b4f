package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins Triangles' degree-ordered enumeration against a naive
  * driver-side oracle: hand shapes, hub graphs (the case orientation
  * exists for), messy input (duplicates, both orientations,
  * self-loops), and seeded random graphs. */
class TrianglesSpec extends AnyFunSuite with SparkTestSession {

  private def perVertex(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Triangles.perVertexCounts(edges.toDF("u", "v"), "u", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def global(edges: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    Triangles.globalCount(edges.toDF("u", "v"), "u", "v").collect()(0).getLong(0)
  }

  /** Naive oracle over the canonicalized edge set. */
  private def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = (canon ++ canon.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val es = canon.toSet
    val out = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((u, v) <- canon; w <- adj(u) & adj(v); if u < v && v < w)
      { out(u) += 1; out(v) += 1; out(w) += 1 }
    assert(es.nonEmpty || out.isEmpty)
    out.toMap
  }

  test("single triangle") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(global(e) == 1L)
    assert(perVertex(e) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangle-free graphs yield zero") {
    assert(global(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == 0L) // path
    assert(global(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == 0L) // C4
    assert(global((1L to 9L).map(i => (0L, i))) == 0L) // star
    assert(perVertex(Seq((1L, 2L))).isEmpty)
  }

  test("K4: four triangles, three per vertex") {
    val ids = Seq(1L, 2L, 3L, 4L)
    val e = for (i <- ids.indices; j <- i + 1 until ids.size)
      yield (ids(i), ids(j))
    assert(global(e) == 4L)
    assert(perVertex(e) == ids.map(_ -> 3L).toMap)
  }

  test("duplicate edges, reversed orientations, and self-loops collapse") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (3L, 3L))
    assert(global(e) == 1L)
    assert(perVertex(e) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hub graph: fan closed by a rim matches the oracle") {
    // Hub 0 to 40 spokes, rim edges i—(i+1): triangles (0, i, i+1).
    val e = (1L to 40L).map(i => (0L, i)) ++
      (1L until 40L).map(i => (i, i + 1))
    assert(perVertex(e) == naive(e))
    assert(global(e) == 39L)
  }

  test("seeded random graphs match the naive oracle") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 10
      val e = (1 to n * 4).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }
      val expected = naive(e)
      assert(perVertex(e) == expected, s"trial $trial")
      assert(global(e) == expected.values.sum / 3, s"trial $trial")
    }
  }

  test("large ids outside the int range are handled") {
    val base = 1L << 40
    val e = Seq((base + 1, base + 2), (base + 2, base + 3),
      (base + 3, base + 1))
    assert(perVertex(e) == Map(base + 1 -> 1L, base + 2 -> 1L,
      base + 3 -> 1L))
  }
}
