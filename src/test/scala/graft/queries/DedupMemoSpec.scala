package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the dup-cluster label memo's staleness contract: the memo is
  * keyed by the corpus path FINGERPRINT (file count + max mtime + total
  * length), so REWRITING the documents table must recompute the labels
  * — never serve the previous vintage's clusters (the exact staleness
  * class ADVICE r9 flagged for the ts-stats cache, guarded here for
  * the round-10 label memo). The two corpus versions have different
  * total byte lengths so the fingerprint differs even on a filesystem
  * with coarse mtime granularity. */
class DedupMemoSpec extends AnyFunSuite with SparkTestSession {

  /** Write a documents.parquet with the driver schema into `dir`. Texts
    * need >= 3 words to produce shingles. */
  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("rewriting the corpus re-keys the label memo, never serves stale clusters") {
    val dir = Files.createTempDirectory("graft-dedup-memo-").toString
    val filler = (1L to 6L).map(i =>
      i * 100 -> s"totally unrelated filler text number $i with words")
    // v1: docs 1 and 2 are identical -> the only cluster is {1, 2}
    writeDocs(dir, Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog") ++ filler)
    val q = SparkEntry.queries("td_dedup_clusters")
    val v1 = q(spark, dir).collect().map(_.getLong(0)).sorted
    assert(v1.toSeq == Seq(1L, 2L), s"v1 cluster should be {1,2}, got ${v1.toSeq}")

    // v2: SAME path, different content (and different total length):
    // now docs 3 and 4 are the identical pair and 1/2 are unrelated
    writeDocs(dir, Seq(
      1L -> "completely different opening sentence for document one now",
      3L -> "pack my box with five dozen liquor jugs tonight together",
      4L -> "pack my box with five dozen liquor jugs tonight together") ++ filler)
    val v2 = q(spark, dir).collect().map(_.getLong(0)).sorted
    assert(v2.toSeq == Seq(3L, 4L),
      s"rewritten corpus must recompute labels: expected {3,4}, got ${v2.toSeq}")
  }

  test("re-keying unpersists and REPLACES the superseded label table (no leak)") {
    val dir = Files.createTempDirectory("graft-dedup-evict-").toString
    val filler = (1L to 6L).map(i =>
      i * 100 -> s"totally unrelated filler text number $i with words")
    writeDocs(dir, Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog") ++ filler)
    val q = SparkEntry.queries("td_dedup_clusters")
    q(spark, dir).collect()
    val keys1 = DedupQueries.labelsCache.keySet().toArray.toSeq
      .map(_.toString).filter(_.contains(dir))
    assert(keys1.size == 1, s"expected one memo entry for $dir, got $keys1")
    val v1Table = DedupQueries.labelsCache.get(keys1.head)._2
    assert(v1Table.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE,
      "memoized label table should be persisted")
    // rewrite → re-key: the v1 entry must be unpersisted and replaced,
    // not left accumulating persisted blocks (VERDICT r10 #1)
    writeDocs(dir, Seq(
      3L -> "pack my box with five dozen liquor jugs tonight together",
      4L -> "pack my box with five dozen liquor jugs tonight together") ++ filler)
    q(spark, dir).collect()
    val keys2 = DedupQueries.labelsCache.keySet().toArray.toSeq
      .map(_.toString).filter(_.contains(dir))
    assert(keys2 == keys1,
      s"re-key must REPLACE under the same path key, got $keys2")
    assert(v1Table.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE,
      "superseded label table must be unpersisted on re-key")
    DedupQueries.releaseMemos(spark, dir)
    assert(!DedupQueries.labelsCache.keySet().toArray.toSeq
      .map(_.toString).exists(_.contains(dir)),
      "releaseMemos must drop the entry")
  }

  test("an EXTERNAL rewrite (no same-session write) invalidates every cache layer") {
    // ADVICE r10: a corpus rewritten by an outside process never fires
    // Spark's recacheByPath, so the plan-keyed persisted verified-pairs
    // table under the memo stays stale unless the memo miss refreshes
    // the path explicitly. Simulated by staging v2 with Spark in a
    // DIFFERENT directory, then moving its bytes over the corpus path
    // with plain file ops.
    val dir = Files.createTempDirectory("graft-dedup-ext-").toString
    val stage = Files.createTempDirectory("graft-dedup-ext-stage-").toString
    val filler = (1L to 6L).map(i =>
      i * 100 -> s"totally unrelated filler text number $i with words")
    writeDocs(dir, Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog") ++ filler)
    val q = SparkEntry.queries("td_dedup_clusters")
    assert(q(spark, dir).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // v2 staged elsewhere (no write touches `dir` in this session) ...
    writeDocs(stage, Seq(
      5L -> "sphinx of black quartz judge my vow again please do",
      6L -> "sphinx of black quartz judge my vow again please do") ++ filler)
    // ... then moved over the corpus path externally
    val dst = java.nio.file.Paths.get(s"$dir/documents.parquet")
    import scala.jdk.CollectionConverters._
    Files.list(dst).iterator().asScala.foreach(Files.delete)
    Files.list(java.nio.file.Paths.get(s"$stage/documents.parquet"))
      .iterator().asScala.filter(Files.isRegularFile(_))
      .foreach(f => Files.copy(f, dst.resolve(f.getFileName.toString)))
    val v2 = q(spark, dir).collect().map(_.getLong(0)).sorted
    assert(v2.toSeq == Seq(5L, 6L),
      s"externally rewritten corpus served stale state: got ${v2.toSeq}")
  }
}
