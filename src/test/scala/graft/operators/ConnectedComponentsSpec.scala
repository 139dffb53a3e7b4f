package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class ConnectedComponentsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    // union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.labels(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction labels long chains, cycles, and stars correctly") {
    val chain = (1L until 40L).map(i => (i, i + 1)) // diameter 39
    val cycle = Seq((100L, 101L), (101L, 102L), (102L, 100L))
    val star = (201L to 210L).map(i => (200L, i))
    val dup = Seq((300L, 301L), (301L, 300L), (300L, 300L)) // dup + self-loop
    val edges = chain ++ cycle ++ star ++ dup
    assert(run(edges) == brute(edges))
  }

  test("star contraction == min-label propagation on random graphs") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = Seq.fill(250) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val a = run(edges)
      val b = ConnectedComponents.labelPropagation(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a == b, s"trial $trial diverged")
      assert(a == brute(edges), s"trial $trial wrong vs union-find")
    }
  }

  test("empty edge set yields empty labels") {
    assert(run(Nil).isEmpty)
  }
}
