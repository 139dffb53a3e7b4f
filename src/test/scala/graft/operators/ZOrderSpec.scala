package graft.operators

import java.nio.file.Files

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SparkTestSession {

  // dims min-max-normalized to the full 16 bits (see ZOrder.normalize16:
  // unnormalized dims degenerate the interleave to a one-column sort)
  private lazy val events = {
    val raw = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val (maxId, maxUser) = {
      val r = raw.agg(max("event_id"), max("user_id")).head()
      (r.getLong(0), r.getLong(1))
    }
    raw.select(col("event_id"),
      ZOrder.normalize16(col("event_id"), maxId).as("a"),
      ZOrder.normalize16(col("user_id"), maxUser).as("b"))
  }

  test("zValue interleaves bits (reference check on known points)") {
    val rows = spark.range(1).select(
      ZOrder.zValue(lit(0L), lit(0L)).as("z00"),
      ZOrder.zValue(lit(1L), lit(0L)).as("z10"),
      ZOrder.zValue(lit(0L), lit(1L)).as("z01"),
      ZOrder.zValue(lit(65535L), lit(65535L)).as("zmax"),
      ZOrder.zValue(lit(0xFFL), lit(0L)).as("zff")).head()
    assert(rows.getLong(0) == 0L)
    assert(rows.getLong(1) == 1L) // a in even bits
    assert(rows.getLong(2) == 2L) // b in odd bits
    assert(rows.getLong(3) == 0xFFFFFFFFL)
    assert(rows.getLong(4) == 0x5555L) // 8 ones spread to even positions
  }

  test("normalize16 is exact past 2^47 (no Long-multiply wraparound)") {
    // c * 65536 wraps Long for c >= 2^47; the decimal-widened form must
    // keep scaling monotonically all the way to Long.MaxValue-1
    val big = Long.MaxValue - 1
    val r = spark.range(1).select(
      ZOrder.normalize16(lit(0L), big).as("lo"),
      ZOrder.normalize16(lit(big / 2), big).as("mid"),
      ZOrder.normalize16(lit(big), big).as("hi"),
      ZOrder.normalize16(lit(1L << 50), big).as("past47")).head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 32767L || r.getLong(1) == 32768L)
    assert(r.getLong(2) == 65535L)
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 65535L)
    assertThrows[IllegalArgumentException] {
      ZOrder.normalize16(lit(1L), Long.MaxValue)
    }
  }

  test("z-layout prunes files on the SECOND dimension; a-sort does not") {
    val zDir = Files.createTempDirectory("graft-zorder-").toString
    val aDir = Files.createTempDirectory("graft-asort-").toString
    val nFiles = 16
    ZOrder.cluster(events, col("a"), col("b"), nFiles)
      .write.mode("overwrite").parquet(zDir)
    events.repartitionByRange(nFiles, col("a"))
      .sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(aDir)

    // per-file [min(b), max(b)] from the written layout — exactly what
    // parquet footer stats give a reader for skipping decisions
    def filesIntersecting(dir: String, lo: Long, hi: Long): (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("b").as("lo"), max("b").as("hi"))
      (stats.filter(col("hi") >= lo && col("lo") <= hi).count(),
        stats.count())
    }
    // a narrow b-band query (an eighth of the observed b domain):
    // under z-layout each file covers a small (a, b) rectangle, so
    // most files' b-ranges miss the band; under a-sorted layout b is
    // unconstrained per file
    val (zHit, zTotal) = filesIntersecting(zDir, 0L, 8191L)
    val (aHit, aTotal) = filesIntersecting(aDir, 0L, 8191L)
    assert(zTotal == nFiles && aTotal == nFiles)
    assert(aHit == nFiles,
      s"a-sorted layout unexpectedly pruned b-predicate files: $aHit")
    assert(zHit * 2 <= nFiles,
      s"z-layout should prune at least half the files, hit $zHit/$nFiles")
    // both layouts hold identical data
    assert(spark.read.parquet(zDir).agg(sum("event_id")).head().getLong(0) ==
      spark.read.parquet(aDir).agg(sum("event_id")).head().getLong(0))
  }
}
