package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The artifact-cache keying contract behind the persisted-index and
  * digest-store /tmp artifacts (review r16): keys are content
  * fingerprints of the TABLE paths a query actually reads, so a
  * rewritten table re-keys the artifact (no stale serve), an unchanged
  * table keeps its key (no rebuild), and the prefix salts format
  * versions apart.
  */
class ArtifactKeySpec extends AnyFunSuite with SparkTestSession {

  private def tableDir(): String = {
    val d = Files.createTempDirectory("graft-akey-").toString + "/t.parquet"
    Files.createDirectories(Paths.get(d))
    Files.writeString(Paths.get(d, "part-0"), "payload-a")
    d
  }

  test("stable for unchanged content; re-keys on in-place part rewrite") {
    val t = tableDir()
    val k1 = Tables.artifactKey(spark, "pfx", t)
    assert(k1 == Tables.artifactKey(spark, "pfx", t),
      "same content must key identically")
    // in-place rewrite INSIDE the table dir (same file name): the
    // table-path fingerprint sees the part file's (len, mtime); a
    // dataset-ROOT fingerprint would not (its listing only stamps the
    // table dir entry) — the exact staleness the review caught
    Thread.sleep(5) // ensure a distinct mtime at ms granularity
    Files.writeString(Paths.get(t, "part-0"), "payload-b!")
    val k2 = Tables.artifactKey(spark, "pfx", t)
    assert(k2 != k1, "rewritten table content must re-key the artifact")
  }

  test("prefix is a format-version salt; paths are order-significant") {
    val (a, b) = (tableDir(), tableDir())
    assert(Tables.artifactKey(spark, "v1", a) !=
      Tables.artifactKey(spark, "v2", a),
      "a format bump must abandon old artifacts")
    assert(Tables.artifactKey(spark, "v1", a, b) !=
      Tables.artifactKey(spark, "v1", b, a),
      "the key must bind fingerprints to their paths")
    // and the human-readable prefix survives into the dir name
    assert(Tables.artifactKey(spark, "graft-incdig", a)
      .startsWith("graft-incdig-"))
  }

  test("unreadable input never yields a stable key") {
    val missing = "/nonexistent/graft-akey-missing"
    val k1 = Tables.artifactKey(spark, "pfx", missing)
    val k2 = Tables.artifactKey(spark, "pfx", missing)
    assert(k1 != k2,
      "error fingerprints must be per-call nonces (forced rebuild), " +
        "never a stable-but-wrong key")
  }
}
