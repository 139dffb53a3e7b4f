package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Regression tests for the operator edge semantics hardened after
  * review: null keys, null payload fields, degenerate windows, and
  * random-data equivalence against the naive formulations.
  */
class OperatorSemanticsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("asofJoin: null right keys match nothing; null left keys get null payload") {
    val left = Seq((Some(1L), 100L, "a"), (None, 100L, "b"))
      .toDF("k", "t", "tag")
    val right = Seq((Some(1L), 50L, "p1"), (None, 10L, "pNull"))
      .toDF("rk", "rt", "price")
    val out = AsOfJoin.asofJoin(left, col("k"), col("t"),
        right, col("rk"), col("rt"), Seq("price"))
      .orderBy("tag").collect()
    assert(out(0).getString(3) == "p1") // tag a matches k=1
    assert(out(1).isNullAt(3)) // null-key left row: no match, not "pNull"
  }

  test("asofJoin: payload comes from ONE right row even with null fields") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq(
      (1L, 10L, Some("old"), Some(5L)),
      (1L, 20L, None: Option[String], Some(7L)) // as-of row, price null
    ).toDF("rk", "rt", "price", "qty")
    val out = AsOfJoin.asofJoin(left, col("k"), col("t"),
        right, col("rk"), col("rt"), Seq("price", "qty")).collect().head
    assert(out.isNullAt(2)) // price from the t=20 row (null), NOT "old"
    assert(out.getLong(3) == 7L) // qty from the same t=20 row
  }

  test("intervalJoin: inverted windows match nothing and never explode") {
    val left = Seq((1L, 1000000L, 0L)).toDF("k", "s", "e") // end < start
    val right = Seq((1L, 500L)).toDF("rk", "rt")
    val out = RangeJoin.intervalJoin(left, col("k"), col("s"), col("e"),
      right, col("rk"), col("rt"), bucketWidth = 100L)
    assert(out.count() == 0)
  }

  test("intervalJoin equals the naive range-predicate join on random data") {
    val rng = new Random(7)
    val left = (1 to 300).map { i =>
      val s = rng.nextInt(10000).toLong
      (i.toLong, rng.nextInt(5).toLong, s, s + 1 + rng.nextInt(500))
    }.toDF("lid", "k", "s", "e")
    val right = (1 to 300).map { i =>
      (i.toLong, rng.nextInt(5).toLong, rng.nextInt(11000).toLong)
    }.toDF("rid", "rk", "rt")
    val got = RangeJoin.intervalJoin(left, col("k"), col("s"), col("e"),
        right, col("rk"), col("rt"), bucketWidth = 256L)
      .select("lid", "rid").orderBy("lid", "rid").collect().toSeq
    val want = left.join(right,
        col("k") === col("rk") && col("rt") >= col("s") && col("rt") < col("e"))
      .select("lid", "rid").orderBy("lid", "rid").collect().toSeq
    assert(got == want && want.nonEmpty)
  }

  test("intervalJoin buckets exactly beyond 2^53 (nanosecond-scale times)") {
    val base = (1L << 54) // beyond double integer precision
    val left = Seq((1L, base, base + 100L)).toDF("k", "s", "e")
    val right = Seq((1L, base + 99L), (1L, base + 100L)).toDF("rk", "rt")
    val out = RangeJoin.intervalJoin(left, col("k"), col("s"), col("e"),
      right, col("rk"), col("rt"), bucketWidth = 64L)
    assert(out.count() == 1) // rt=base+99 in [s,e); rt=base+100 excluded
  }
}
