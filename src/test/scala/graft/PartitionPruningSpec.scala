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

  test("dynamic partition overwrite replaces only the touched partitions") {
    // the write-side half of incremental ingest: re-running one
    // partition's backfill must not wipe the others (static overwrite
    // truncates the whole table root; dynamic replaces only partitions
    // present in the incoming frame — the idempotent per-partition
    // publish at any scale)
    val dir = Files.createTempDirectory("graft-dyn-").toString + "/docs"
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.write.partitionBy("lang").parquet(dir)
    val before = spark.read.parquet(dir)
    val langs = before.select("lang").distinct().count()
    assert(langs > 1, "fixture needs >1 partition for this test")
    val enOnly = docs.filter(col("lang") === "en")
      .withColumn("n_chars", col("n_chars") + 1000000)

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try enOnly.write.mode("overwrite").partitionBy("lang").parquet(dir)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    val after = spark.read.parquet(dir)
    // untouched partitions intact...
    assert(after.select("lang").distinct().count() == langs)
    assert(after.filter(col("lang") =!= "en").count() ==
      docs.filter(col("lang") =!= "en").count())
    // ...and the touched partition fully replaced, not appended
    assert(after.filter(col("lang") === "en").count() == enOnly.count())
    assert(after.filter(col("lang") === "en")
      .agg(min(col("n_chars"))).head().getLong(0) >= 1000000)
  }

  test("dynamic partition pruning fires on a dim-filtered join") {
    // the 100-TB join-pruning path: the fact is partitioned on the join
    // key, the dim filter is NOT a literal on the fact, yet the scan
    // must still skip fact partitions — Spark inserts a runtime
    // dynamicpruning subquery fed by the (broadcast) dim. Static
    // pruning can't do this; without DPP the scan reads every
    // partition and the join discards them after IO.
    val dir = Files.createTempDirectory("graft-dpp-").toString + "/docs"
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    docs.write.partitionBy("lang").parquet(dir)

    val fact = spark.read.parquet(dir)
    // dim filter on a NON-key attribute (per-lang doc count), so the
    // predicate cannot be constant-propagated onto the join key as a
    // static partition filter — only a runtime subquery can prune
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val cutoff = counts.agg(max(col("n_docs"))).head().getLong(0)
    val dim = counts.filter(col("n_docs") === cutoff)
    assert(dim.count() < counts.count(),
      "fixture needs the cutoff to select a strict subset of langs")
    val joined = fact.join(dim.hint("broadcast"), "lang")
      .agg(count(lit(1)).as("n"))
    // collect() then read the SAME QueryExecution: head()/count() plan
    // separate limited queries, and DPP subquery wiring only shows on
    // the executed adaptive plan
    val rows = joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
    val expected = docs.join(dim.select("lang"), "lang").count()
    assert(rows.head.getLong(0) == expected && expected > 0)
  }
}
