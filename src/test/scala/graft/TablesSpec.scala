package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Covers [[Tables.loadStream]] — the round-4 regression lived exactly
  * here: a literal single-file path makes FileStreamSource inject the
  * file as `basePath`, which PartitioningAwareFileIndex rejects. The
  * glob form must stream BOTH the driver layout (one file per table)
  * and the scale layout (a directory of part files).
  */
class TablesSpec extends AnyFunSuite with SparkTestSession {

  private def drain(df: org.apache.spark.sql.DataFrame, name: String) = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    spark.table(name)
  }

  test("loadStream streams the single-file driver layout with batch parity") {
    val dir = "/root/testdata/sf0.001"
    val batch = Tables.load(spark, dir, "events")
    val stream = Tables.loadStream(spark, dir, "events")
    assert(stream.isStreaming)
    assert(stream.schema == batch.schema) // incl. the nanos→µs ts dialect
    val streamed = drain(stream, "tables_ls_events")
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.agg(max("ts")).head.getTimestamp(0) ==
      batch.agg(max("ts")).head.getTimestamp(0))
  }

  test("loadStream streams a directory of part files (the scale layout)") {
    val stage = Files.createTempDirectory("tables-stream-").toString
    val batch = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    batch.repartition(3).write.parquet(s"$stage/orders.parquet")
    val streamed = drain(
      Tables.loadStream(spark, stage, "orders"), "tables_ls_orders")
    assert(streamed.count() == batch.count() && batch.count() > 0)
  }
}
