package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftGenSpec extends AnyFunSuite with SparkTestSession {

  private def gen(rows: Long, slices: Int) =
    spark.read.format("graftgen")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("generates the documented formula") {
    val rows = gen(200, 4).orderBy("id").collect()
    assert(rows.length == 200)
    val r150 = rows(150)
    assert(r150.getLong(0) == 150L)
    assert(r150.getString(1) == "w" + (150 % 97))
    assert(r150.getDouble(2) == ((150 * 7) % 100).toDouble / 10.0)
  }

  test("id-range filters push down and prune physically generated rows") {
    GraftGen.rowsGenerated.set(0)
    val n = gen(1000000, 32)
      .filter(col("id") >= 10000 && col("id") < 12000)
      .count()
    assert(n == 2000)
    // exactly the pushed range is generated: whole slices outside it are
    // never planned and the reader clamps within its slice
    assert(GraftGen.rowsGenerated.get() == 2000,
      s"generated ${GraftGen.rowsGenerated.get()} rows for a 2000-row range")
    // and the scan shows the pushed range, no residual Filter on id
    val plan = gen(1000000, 32)
      .filter(col("id") >= 10000 && col("id") < 12000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("[10000, 12000)"), plan)
  }

  test("column pruning reaches the reader") {
    val df = gen(100, 2).select(sum(col("val")))
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("graftgen")).get
    assert(scanLine.contains("columns=val"), scanLine)
    val expected = (0 until 100).map(i => ((i * 7) % 100).toDouble / 10.0).sum
    assert(df.head.getDouble(0) == expected)
  }

  test("equality pushdown plans a single one-row partition") {
    GraftGen.rowsGenerated.set(0)
    val rows = gen(1000000, 32).filter(col("id") === 777777L).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(777777L))
    assert(GraftGen.rowsGenerated.get() == 1)
  }

  test("micro-batch stream drains via offsets; restart is exactly-once") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graftgen-out-").toString
    val ck = Files.createTempDirectory("graftgen-ck-").toString
    def runOnce() = {
      val q = spark.readStream.format("graftgen")
        .option("rows", "1000").option("slices", "4")
        .option("rowsPerBatch", "300").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try { q.awaitTermination(120000); q.recentProgress }
      finally q.stop()
    }
    val progress = runOnce()
    // admission control: 1000 rows at 300/batch -> 4 data batches
    assert(progress.count(_.numInputRows > 0) == 4,
      progress.map(_.numInputRows).mkString(","))
    val first = spark.read.parquet(out)
    assert(first.count() == 1000)
    assert(first.agg(sum(col("id"))).head.getLong(0) == 499500L)
    // second incarnation from the same checkpoint: offsets are committed,
    // the bounded source is drained -> zero new rows, no re-emit
    runOnce()
    assert(spark.read.parquet(out).count() == 1000)
  }
}
