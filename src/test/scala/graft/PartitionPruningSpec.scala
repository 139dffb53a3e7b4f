package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The partitioned-lake scale path: hive-style partition layout written
  * with partitionBy, and — the property that matters at 100 TB — the
  * physical plan pruning entire partitions from the scan when the query
  * filters on the partition column.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkTestSession {

  test("partitionBy layout prunes partitions at scan time") {
    val dir = Files.createTempDirectory("graft-lake-").toString + "/docs"
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    docs.write.partitionBy("lang").parquet(dir)

    val filtered = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("isnotnull(lang") ||
      scanLine.contains("(lang"), scanLine)
    assert(!scanLine.contains("PartitionFilters: []"), scanLine)

    val expected = docs.filter(col("lang") === "en").count()
    assert(filtered.count() == expected && expected > 0)

    // partition directories are the hive layout downstream readers expect
    val langDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(langDirs.exists(_.startsWith("lang=")))
  }
}
