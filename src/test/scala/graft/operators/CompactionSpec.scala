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
