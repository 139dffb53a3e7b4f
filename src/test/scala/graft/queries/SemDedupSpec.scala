package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pin for td_semdedup (SemDeDup: within-kmeans-cell cosine
  * prune, keep lowest id). The oracle gate proves value-level parity
  * with DuckDB; this spec pins the SEMANTICS against an independent
  * driver-side reimplementation of the pairing/pruning rule, so a
  * future refactor that drifts the Spark side and the oracle SQL in
  * lockstep cannot silently change what "kept" means.
  */
class SemDedupSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val result =
    SparkEntry.registry("td_semdedup").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

  test("one row per vector, keyed by vec_id") {
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(result.length == n)
    assert(result.map(_._1).distinct.length == result.length)
  }

  test("cells are the shared Lloyd(2) assignment") {
    val cells = SimilarityQueries.kmeansAssign(spark, sfDir)
      .select(col("vec_id"), col("cell_lloyd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    result.foreach { case (id, cell, _) => assert(cells(id) == cell) }
  }

  test("kept == no lower-id same-cell vector at cosine >= 0.4 " +
      "(independent driver-side replay)") {
    // normalized vectors + cells, then the O(n^2)-within-cell rule in
    // plain Scala — independent of the query's join/distinct plumbing
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        val nrm = math.sqrt(v.map(x => x * x).sum)
        r.getLong(0) -> v.map(_ / nrm)
      }.toMap
    val cellOf = result.map(t => t._1 -> t._2).toMap
    val ids = result.map(_._1).sorted
    val expectedPruned = (for {
      b <- ids
      a <- ids if a < b && cellOf(a) == cellOf(b)
      cos = vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum
      if cos >= 0.4
    } yield b).toSet
    result.foreach { case (id, _, kept) =>
      assert(kept == !expectedPruned(id),
        s"vec $id: kept=$kept but expectedPruned=${expectedPruned(id)}")
    }
    // the fixture must exercise BOTH branches at this SF for the pin to
    // mean anything; if it stops doing so, fail loudly rather than pass
    // vacuously (sf0.001 currently prunes a handful of vectors)
    assert(result.exists(_._3) && result.exists(!_._3),
      "fixture no longer exercises both kept branches at sf0.001")
  }

  test("spark.graft.semdedup.cells grows the blocking cell count " +
      "(bench-only knob; default 8 matches the oracle)") {
    // default: cells are the k=8 assignment (0..7)
    assert(result.map(_._2).max < 8)
    try {
      spark.conf.set("spark.graft.semdedup.cells", "16")
      val cells16 = SparkEntry.registry("td_semdedup").build(spark, sfDir)
        .select(col("cell")).collect().map(_.getLong(0))
      // the 16-seed assignment must actually use the extra seeds
      assert(cells16.max >= 8 && cells16.max < 16)
    } finally spark.conf.unset("spark.graft.semdedup.cells")
  }
}
