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

  test("a marker-less GRAFT directory is torn down and rebuilt") {
    val dir = freshDir("crash")
    // simulate a torn layout from a crashed builder: the sentinel is
    // stamped before the first content byte (ensurePublished), so a
    // torn graft dir ALWAYS carries it — content, sentinel, no marker
    Files.createDirectories(Paths.get(dir, "postings"))
    Files.writeString(Paths.get(dir, "postings", "junk"), "torn")
    Files.createFile(Paths.get(dir, graft.Tables.ArtifactSentinel))
    IvfIndex.ensureSaved(dir)(IvfIndex.build(corpus(), cells = 16))
    assert(Files.exists(Paths.get(dir, "_graft_ivf_ok")))
    assert(!Files.exists(Paths.get(dir, "postings", "junk")),
      "torn content must not survive the rebuild")
    val (_, lp) = IvfIndex.load(spark, dir)
    assert(lp.count() == corpus().count())
  }

  test("a foreign non-artifact directory is REFUSED, never deleted") {
    // VERDICT r16 #5: publishDir's destructive branch used to
    // deleteRecursively whatever sat at the target; a call site
    // pointing at pre-existing foreign data would destroy it. Now the
    // teardown requires the ownership sentinel (or the marker).
    val dir = freshDir("foreign")
    Files.createDirectories(Paths.get(dir, "precious"))
    Files.writeString(Paths.get(dir, "precious", "data.txt"), "keep me")
    val ex = intercept[IllegalStateException] {
      IvfIndex.ensureSaved(dir)(IvfIndex.build(corpus(), cells = 16))
    }
    assert(ex.getMessage.contains("refusing to tear down"))
    assert(Files.exists(Paths.get(dir, "precious", "data.txt")),
      "foreign data must survive the refused publish byte-for-byte")
    assert(Files.readString(Paths.get(dir, "precious", "data.txt"))
      == "keep me")
  }

  test("a PRE-SENTINEL torn graft layout is recognized and rebuilt") {
    // ADVICE r17 migration path: builds older than the sentinel left
    // torn layouts with content but neither marker nor sentinel; the
    // r17 ownership guard hard-failed every publish at such a key
    // forever (and discarded the fresh staging artifact). A dir whose
    // entries are all Spark write outputs / _graft_* names is
    // structurally ours and may be torn down and rebuilt.
    val dir = freshDir("presentinel")
    Files.createDirectories(Paths.get(dir, "postings"))
    Files.writeString(Paths.get(dir, "postings", "part-00000"), "torn")
    Files.createFile(Paths.get(dir, "postings", "_SUCCESS"))
    Files.createDirectories(Paths.get(dir, "centroids"))
    Files.writeString(Paths.get(dir, "centroids", "part-00000"), "torn")
    IvfIndex.ensureSaved(dir)(IvfIndex.build(corpus(), cells = 16))
    assert(Files.exists(Paths.get(dir, "_graft_ivf_ok")))
    val (_, lp) = IvfIndex.load(spark, dir)
    assert(lp.count() == corpus().count())
    // but ONE unrecognized entry anywhere makes it foreign again
    val dir2 = freshDir("presentinel2")
    Files.createDirectories(Paths.get(dir2, "postings"))
    Files.createFile(Paths.get(dir2, "postings", "_SUCCESS"))
    Files.writeString(Paths.get(dir2, "postings", "notes.md"), "keep")
    val ex = intercept[IllegalStateException] {
      IvfIndex.ensureSaved(dir2)(IvfIndex.build(corpus(), cells = 16))
    }
    assert(ex.getMessage.contains("refusing to tear down"))
    assert(Files.readString(Paths.get(dir2, "postings", "notes.md"))
      == "keep")
  }

  test("published artifacts carry the ownership sentinel") {
    val dir = freshDir("sentinel")
    IvfIndex.ensureSaved(dir)(IvfIndex.build(corpus(), cells = 16))
    assert(Files.exists(Paths.get(dir, graft.Tables.ArtifactSentinel)),
      "the sentinel must ride the publish rename into the artifact")
  }

  test("sweepStaleSiblings: old kin swept, young and foreign spared") {
    // ADVICE r16: content-keyed families leak superseded vintages and
    // orphaned staging dirs. The sweep runs after a successful publish
    // and must delete ONLY provably-graft siblings older than the age
    // bound.
    // names use the PRODUCTION key shape — artifactKey emits take(6)
    // BYTES = 12 hex chars (the r17 review caught a {6}-only gate that
    // made the sweep a silent no-op on every real family)
    val parent = Files.createTempDirectory("graft-sweep-")
    val fam = (h: String) => parent.resolve(s"graft-unit-$h")
    // the freshly published dir (never swept: it is `dir` itself)
    val live = fam("aaaaaaaaaaaa")
    Files.createDirectories(live)
    // an OLD superseded vintage with a marker (pre-sentinel rounds)
    val staleKey = fam("bbbbbbbbbbbb")
    Files.createDirectories(staleKey)
    Files.createFile(staleKey.resolve("_graft_pub_ok"))
    // an OLD orphaned staging dir
    val staleTmp = parent.resolve("graft-unit-cccccccccccc.tmp-42-1")
    Files.createDirectories(staleTmp)
    // an OLD dir sharing the stem but provably NOT ours
    val foreign = fam("dddddddddddd")
    Files.createDirectories(foreign)
    Files.writeString(foreign.resolve("user.txt"), "mine")
    // a YOUNG graft sibling (a concurrent builder's fresh vintage)
    val young = fam("eeeeeeeeeeee")
    Files.createDirectories(young)
    Files.createFile(young.resolve(graft.Tables.ArtifactSentinel))
    // an OLD graft sibling from an EXTENDED family — shares the stem
    // prefix but is not stem+hexkey, so it belongs to a DIFFERENT
    // key family and must be spared (r17 review)
    val extended = parent.resolve("graft-unit-v2-ffffffffffff")
    Files.createDirectories(extended)
    Files.createFile(extended.resolve(graft.Tables.ArtifactSentinel))
    // an OLD staging dir whose ROOT mtime is stale but which a live
    // builder touched DEEP inside recently — must be spared (age is
    // judged on the deepest mtime; r17 review)
    val liveStaging = parent.resolve("graft-unit-999999999999.tmp-7-1")
    Files.createDirectories(liveStaging.resolve("postings"))
    Files.writeString(liveStaging.resolve("postings/part-0"), "writing")
    // past the 12 h default bound (lengthened in r18, ADVICE r17: the
    // bound is also the ceiling on how long a lazy reader may serve a
    // superseded vintage without re-resolving its artifactKey)
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 13L * 3600 * 1000)
    // age the stale dirs DEEPLY (the sweep judges the deepest mtime)
    for (d <- Seq(staleKey, staleTmp, foreign, extended)) {
      val w = Files.walk(d)
      try w.forEach(Files.setLastModifiedTime(_, old))
      finally w.close()
    }
    Files.setLastModifiedTime(liveStaging, old) // root stale, child fresh
    // the opt-out kills the GC entirely (ADVICE r17: a process serving
    // lazy-loaded vintages indefinitely sets this instead of racing
    // the age bound)
    System.setProperty("graft.artifact.sweep", "off")
    try graft.Tables.sweepStaleSiblings(live.toString)
    finally System.clearProperty("graft.artifact.sweep")
    assert(Files.exists(staleKey) && Files.exists(staleTmp),
      "-Dgraft.artifact.sweep=off must disable the GC")
    graft.Tables.sweepStaleSiblings(live.toString)
    assert(!Files.exists(staleKey), "old superseded vintage must be swept")
    assert(!Files.exists(staleTmp), "old orphaned staging must be swept")
    assert(Files.exists(foreign), "non-graft sibling must be spared")
    assert(Files.exists(young), "young graft sibling must be spared")
    assert(Files.exists(extended), "extended-family sibling must be spared")
    assert(Files.exists(liveStaging.resolve("postings/part-0")),
      "a staging dir with recent deep writes must be spared")
    assert(Files.exists(live))
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
