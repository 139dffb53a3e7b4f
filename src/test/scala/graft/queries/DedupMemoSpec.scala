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
}
