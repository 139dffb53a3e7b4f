package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkTestSession
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The publish protocol behind every persisted-index consumer
  * (st_incremental_ann, IndexPersist): `IvfIndex.ensureSaved` must be
  * build-once (second call is a no-op on a complete artifact),
  * crash-safe (a directory without the completion marker is torn down
  * and rebuilt — the marker is stamped inside the staging dir BEFORE
  * the atomic rename, so a visible dir missing it can only be a
  * pre-protocol or torn layout), and loser-safe (a builder whose
  * rename loses to a concurrent publisher discards its staging dir
  * and reads the winner).
  */
class EnsureSavedSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def corpus() = {
    val n = DedupQueries.normalizedEmbeddings(spark, sfDir)
    n.filter(col("vec_id") % 5 =!= 4).select(col("vec_id"), col("an"))
  }

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-ensure-$tag-").toString + "/index"

  test("second call is a no-op: the artifact is not rebuilt") {
    val dir = freshDir("noop")
    var builds = 0
    def buildOnce() = { builds += 1; IvfIndex.build(corpus(), cells = 16) }
    IvfIndex.ensureSaved(dir)(buildOnce())
    assert(builds == 1)
    val marker = Paths.get(dir, "_graft_ivf_ok")
    val stamp = Files.getLastModifiedTime(marker)
    IvfIndex.ensureSaved(dir)(buildOnce())
    assert(builds == 1, "complete artifact must not trigger a rebuild")
    assert(Files.getLastModifiedTime(marker) == stamp)
    // and the published artifact round-trips
    val (lc, lp) = IvfIndex.load(spark, dir)
    assert(lc.count() == 16 && lp.count() == corpus().count())
  }

  test("a marker-less directory is torn down and rebuilt") {
    val dir = freshDir("crash")
    // simulate a pre-protocol / torn layout: content but no marker
    Files.createDirectories(Paths.get(dir, "postings"))
    Files.writeString(Paths.get(dir, "postings", "junk"), "torn")
    IvfIndex.ensureSaved(dir)(IvfIndex.build(corpus(), cells = 16))
    assert(Files.exists(Paths.get(dir, "_graft_ivf_ok")))
    assert(!Files.exists(Paths.get(dir, "postings", "junk")),
      "torn content must not survive the rebuild")
    val (_, lp) = IvfIndex.load(spark, dir)
    assert(lp.count() == corpus().count())
  }

  test("a losing builder discards its staging dir; the winner survives") {
    val dir = freshDir("race")
    // winner publishes first
    IvfIndex.ensureSaved(dir)(IvfIndex.build(corpus(), cells = 16))
    val winnerStamp =
      Files.getLastModifiedTime(Paths.get(dir, "_graft_ivf_ok"))
    // the loser's exact interleaving: it checked the marker before the
    // winner's rename (absent), built, staged — and now its publish
    // hits the winner's published dir
    val staging = s"$dir.tmp-loser"
    Files.createDirectories(Paths.get(staging))
    Files.writeString(Paths.get(staging, "_graft_ivf_ok"), "")
    IvfIndex.publish(staging, dir)
    assert(!Files.exists(Paths.get(staging)),
      "losing staging dir must be discarded")
    assert(Files.getLastModifiedTime(Paths.get(dir, "_graft_ivf_ok"))
      == winnerStamp, "published artifact must survive untouched")
    val (lc, lp) = IvfIndex.load(spark, dir)
    assert(lc.count() == 16 && lp.count() == corpus().count())
  }
}
