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
    // collect (not count: count(*) now rides the COMPLETE aggregate
    // pushdown and generates zero rows) so readers physically run
    val n = gen(1000000, 32)
      .filter(col("id") >= 10000 && col("id") < 12000)
      .collect().length
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

  test("columnar batch reads match the row path and plan ColumnarToRow") {
    val columnar = gen(100000, 8).filter(col("id") < 50000)
    assert(columnar.queryExecution.executedPlan.toString
      .contains("ColumnarToRow"))
    val rowPath = spark.read.format("graftgen")
      .option("rows", "100000").option("slices", "8")
      .option("columnar", "false").load()
      .filter(col("id") < 50000)
    assert(!rowPath.queryExecution.executedPlan.toString
      .contains("ColumnarToRow"))
    // identical content and identical physical-rows accounting
    GraftGen.rowsGenerated.set(0)
    val a = columnar.orderBy("id").collect()
    val colGenerated = GraftGen.rowsGenerated.get()
    GraftGen.rowsGenerated.set(0)
    val b = rowPath.orderBy("id").collect()
    assert(colGenerated == GraftGen.rowsGenerated.get())
    assert(a.toSeq == b.toSeq)
  }

  test("runtime filtering prunes slices from a join's build side") {
    // fact: 1M ids in 32 slices. dim: 20 ids inside one narrow band,
    // selectively filtered on a NON-key attribute (a key filter would
    // constant-propagate into a static pushdown and bypass the runtime
    // path). The broadcast join's build side hands its id set to the
    // scan via SupportsRuntimeFiltering; the scan narrows to the set's
    // envelope and drops the other slices.
    import spark.implicits._
    GraftGen.rowsGenerated.set(0)
    GraftGen.runtimePrunedPartitions.set(0)
    // the dim must be a real source, not a LocalRelation:
    // ConvertToLocalRelation folds a filter over in-memory rows into
    // the relation itself, and with no Filter node left the DPP rule
    // sees no selective predicate and declines
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft_rtf_dim").toString
    (0 until 40)
      .map(i => (500000L + i, if (i < 20) "keep" else "drop"))
      .toDF("fid", "category")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val fact = gen(1000000, 32)
    val out = fact.join(broadcast(dim.filter($"category" === "keep")),
        $"id" === $"fid")
      .select($"id", $"text")
      .collect()
    assert(out.length == 20)
    assert(GraftGen.runtimePrunedPartitions.get() > 0,
      "no partitions were runtime-pruned")
    // the scan physically generated only the envelope band's slice
    // (31250 ids per slice), not the 1M-row id space
    assert(GraftGen.rowsGenerated.get() <= 1000000 / 32,
      s"generated ${GraftGen.rowsGenerated.get()} rows")
  }

  test("complete aggregate pushdown answers from metadata, zero rows") {
    GraftGen.rowsGenerated.set(0)
    val row = gen(1000000, 32)
      .filter(col("id") >= 500 && col("id") < 99500)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"))
      .head()
    assert(row.getLong(0) == 99000 && row.getLong(1) == 500 &&
      row.getLong(2) == 99499, row.toString)
    // the answer came from the interval arithmetic, not from data
    assert(GraftGen.rowsGenerated.get() == 0,
      s"generated ${GraftGen.rowsGenerated.get()} rows for a pushed agg")
    val plan = gen(1000000, 32)
      .filter(col("id") >= 500 && col("id") < 99500)
      .agg(count(lit(1)), min(col("id")), max(col("id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("agg-pushdown"), plan)
  }

  test("aggregates the source cannot answer fall back to the row path") {
    GraftGen.rowsGenerated.set(0)
    // sum(val) is not translatable -> normal scan + Spark-side agg
    val s = gen(1000, 4).agg(sum(col("val"))).head().getDouble(0)
    assert(GraftGen.rowsGenerated.get() == 1000,
      "fallback should generate the full range")
    assert(math.abs(s - (0L until 1000L).map(i => ((i * 7) % 100) / 10.0).sum)
      < 1e-9)
  }

  test("column pruning reaches the reader") {
    val df = gen(100, 2).select(sum(col("val")))
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("graftgen")).get
    assert(scanLine.contains("columns=val"), scanLine)
    val expected = (0 until 100).map(i => ((i * 7) % 100).toDouble / 10.0).sum
    assert(df.head().getDouble(0) == expected)
  }

  test("equality pushdown plans a single one-row partition") {
    GraftGen.rowsGenerated.set(0)
    val rows = gen(1000000, 32).filter(col("id") === 777777L).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(777777L))
    assert(GraftGen.rowsGenerated.get() == 1)
  }

  test("batch write goes through the commit protocol into the store") {
    GraftGen.committed.remove("t_spec")
    gen(500, 4).filter(col("id") < 100)
      .write.format("graftgen").option("table", "t_spec")
      .mode("append").save()
    val rows = GraftGen.committed.get("t_spec")
    assert(rows != null && rows.size == 100)
    assert(rows.map(_._1).sorted == (0L until 100L))
    assert(rows.forall { case (id, text, v) =>
      text == "w" + (id % 97) && v == ((id * 7) % 100).toDouble / 10.0
    })
  }

  test("uncommitted and aborted writer output is never visible") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    GraftGen.committed.remove("t_abort")
    def row(id: Long) =
      InternalRow(id, UTF8String.fromString("x"), 1.0)
    // task writes then ABORTS: its buffer must never surface
    val w1 = new GenDataWriter
    w1.write(row(1)); w1.write(row(2)); w1.abort()
    // a second task commits its message, but until the DRIVER commits
    // the job, the store stays empty
    val w2 = new GenDataWriter
    w2.write(row(3))
    val msg = w2.commit()
    assert(!GraftGen.committed.containsKey("t_abort"))
    // job-level abort: still nothing
    val bw = new GenBatchWrite("t_abort")
    bw.abort(Array(msg))
    assert(!GraftGen.committed.containsKey("t_abort"))
    // job-level commit installs exactly the committed task's rows
    bw.commit(Array(msg))
    assert(GraftGen.committed.get("t_abort").map(_._1) == Vector(3L))
  }

  test("streaming sink commits per epoch; a replayed epoch is a no-op") {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    GraftGen.committed.remove("t_stream")
    GraftGen.committedEpochs.keySet().asScala
      .filter(_.startsWith("t_stream#")).toSet
      .foreach((k: String) => GraftGen.committedEpochs.remove(k))
    val ck = Files.createTempDirectory("graftgen-sink-ck-").toString
    // end-to-end: custom source -> custom streaming sink, 2 data epochs
    val q = spark.readStream.format("graftgen")
      .option("rows", "400").option("slices", "4")
      .option("rowsPerBatch", "200").load()
      .writeStream.format("graftgen").option("table", "t_stream")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val rows = GraftGen.committed.get("t_stream")
    assert(rows != null && rows.map(_._1).sorted == (0L until 400L))
    // the ledger is keyed (table, queryId): recover the query's key
    val ledgerKey = GraftGen.committedEpochs.keySet().asScala
      .find(_.startsWith("t_stream#")).get
    assert(GraftGen.committedEpochs.get(ledgerKey).size() >= 2)

    // replay an already-committed epoch (failure between sink commit and
    // checkpoint write): same queryId -> the ledger makes it a no-op
    val queryId = ledgerKey.stripPrefix("t_stream#")
    val sw = new GenStreamingWrite("t_stream", queryId)
    val epoch = GraftGen.committedEpochs.get(ledgerKey).keys()
      .nextElement().longValue()
    sw.commit(epoch, Array(GenCommit(Seq((999L, "dup", 0.0)))))
    assert(GraftGen.committed.get("t_stream").size == 400,
      "replayed epoch appended rows — sink is not idempotent")
  }

  test("a NEW query reusing a table name is not swallowed as a replay") {
    GraftGen.committed.remove("t_requeue")
    GraftGen.committedEpochs.remove(GraftGen.ledgerKey("t_requeue", "qA"))
    GraftGen.committedEpochs.remove(GraftGen.ledgerKey("t_requeue", "qB"))
    // first query commits its epoch 0
    new GenStreamingWrite("t_requeue", "qA")
      .commit(0L, Array(GenCommit(Seq((1L, "a", 0.0)))))
    // a different query (fresh checkpoint, epochs restart at 0) writes
    // to the same table: must commit, not be dropped as a replay of qA
    new GenStreamingWrite("t_requeue", "qB")
      .commit(0L, Array(GenCommit(Seq((2L, "b", 0.0)))))
    assert(GraftGen.committed.get("t_requeue").map(_._1).sorted ==
      Vector(1L, 2L))
    // while a true replay within qB is still a no-op
    new GenStreamingWrite("t_requeue", "qB")
      .commit(0L, Array(GenCommit(Seq((3L, "c", 0.0)))))
    assert(GraftGen.committed.get("t_requeue").size == 2)
  }

  test("overwrite mode truncates previously committed table state") {
    GraftGen.committed.remove("t_trunc")
    gen(500, 4).filter(col("id") < 50)
      .write.format("graftgen").option("table", "t_trunc")
      .mode("append").save()
    assert(GraftGen.committed.get("t_trunc").size == 50)
    gen(500, 4).filter(col("id") < 20)
      .write.format("graftgen").option("table", "t_trunc")
      .mode("overwrite").save()
    assert(GraftGen.committed.get("t_trunc").map(_._1).sorted ==
      (0L until 20L), "overwrite must replace, not append")
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
    assert(first.agg(sum(col("id"))).head().getLong(0) == 499500L)
    // second incarnation from the same checkpoint: offsets are committed,
    // the bounded source is drained -> zero new rows, no re-emit
    runOnce()
    assert(spark.read.parquet(out).count() == 1000)
  }
}
