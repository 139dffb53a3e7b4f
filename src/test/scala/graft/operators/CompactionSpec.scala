package graft.operators

import java.nio.file.Files

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite with SparkTestSession {

  private def writeFragmented(dir: String): Long = {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    // simulate many small ingest batches: 12 writers per partition
    docs.repartition(12).write.partitionBy("lang").parquet(dir)
    docs.count()
  }

  private def dataFileCount(dir: String): Int = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .count { p =>
        val n = p.getFileName.toString
        java.nio.file.Files.isRegularFile(p) &&
          !n.startsWith("_") && !n.startsWith(".")
      }
  }

  test("compaction collapses per-partition small files, content unchanged") {
    val dir = Files.createTempDirectory("graft-compact-").toString + "/docs"
    val nRows = writeFragmented(dir)
    val beforeContent = spark.read.parquet(dir)
      .orderBy("doc_id").collect().toSeq
    val langs = spark.read.parquet(dir).select("lang").distinct().count()
    val fragmented = dataFileCount(dir)
    assert(fragmented > langs, s"fixture not fragmented: $fragmented files")

    val (swapped, before, after) =
      Compaction.compactPartitioned(spark, dir, Seq("lang"))

    assert(swapped == langs)
    assert(before == fragmented)
    // one task per partition value -> one file per partition
    assert(after == langs, s"expected $langs files after compaction, got $after")
    val afterDf = spark.read.parquet(dir)
    assert(afterDf.count() == nRows)
    assert(afterDf.orderBy("doc_id").collect().toSeq == beforeContent)
    // no staging droppings left behind
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("-compact-")))
  }

  test("recovers a crashed swap: orphaned .compact-bak leaf is restored") {
    val dir = Files.createTempDirectory("graft-compact3-").toString + "/docs"
    val nRows = writeFragmented(dir)
    val content = spark.read.parquet(dir).orderBy("doc_id").collect().toSeq

    // simulate a crash between rename-aside and rename-in: one leaf
    // exists only as its backup; another has a stale backup alongside
    // a live copy (crash after that leaf's swap completed)
    val root = new java.io.File(dir)
    val leaves = root.listFiles().filter(f => f.isDirectory &&
      f.getName.contains("=")).sortBy(_.getName)
    assert(leaves.length >= 2, "fixture needs >=2 lang partitions")
    val orphan = leaves.head
    val orphanBak = new java.io.File(root, s".${orphan.getName}.compact-bak")
    assert(orphan.renameTo(orphanBak))
    val stale = new java.io.File(root, s".${leaves(1).getName}.compact-bak")
    assert(stale.mkdir())

    val (swapped, _, after) =
      Compaction.compactPartitioned(spark, dir, Seq("lang"))

    assert(swapped == leaves.length) // orphan restored, then compacted
    assert(after == leaves.length)
    val afterDf = spark.read.parquet(dir)
    assert(afterDf.count() == nRows)
    assert(afterDf.orderBy("doc_id").collect().toSeq == content)
    assert(!root.listFiles().exists(_.getName.endsWith(".compact-bak")))
  }

  test("standalone repair heals a crashed swap without a rewrite") {
    val dir = Files.createTempDirectory("graft-compact4-").toString + "/docs"
    val nRows = writeFragmented(dir)
    val content = spark.read.parquet(dir).orderBy("doc_id").collect().toSeq

    val root = new java.io.File(dir)
    val leaves = root.listFiles().filter(f => f.isDirectory &&
      f.getName.contains("=")).sortBy(_.getName)
    assert(leaves.length >= 2, "fixture needs >=2 lang partitions")
    val orphan = leaves.head
    val orphanBak = new java.io.File(root, s".${orphan.getName}.compact-bak")
    assert(orphan.renameTo(orphanBak))
    val stale = new java.io.File(root, s".${leaves(1).getName}.compact-bak")
    assert(stale.mkdir())

    val (restored, dropped) = Compaction.repair(spark, dir, Seq("lang"))
    assert(restored == 1 && dropped == 1)
    // table is whole again, file layout untouched (no rewrite ran)
    val afterDf = spark.read.parquet(dir)
    assert(afterDf.count() == nRows)
    assert(afterDf.orderBy("doc_id").collect().toSeq == content)
    assert(!root.listFiles().exists(_.getName.endsWith(".compact-bak")))
    // idempotent on a healthy table
    assert(Compaction.repair(spark, dir, Seq("lang")) == ((0, 0)))
  }

  test("maxRecordsPerFile splits oversized partitions during compaction") {
    val dir = Files.createTempDirectory("graft-compact2-").toString + "/docs"
    writeFragmented(dir)
    val perLang = spark.read.parquet(dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cap = 40L
    val prev = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", cap.toString)
    val (_, _, after) =
      try Compaction.compactPartitioned(spark, dir, Seq("lang"))
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.files.maxRecordsPerFile", v)
        case None => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      }
    val expected = perLang.values.map(n => ((n + cap - 1) / cap).toInt).sum
    assert(after == expected,
      s"expected $expected files (per-partition ceil(n/$cap)), got $after")
  }
}
