package graft.streaming

import java.sql.DriverManager

import graft.SparkTestSession
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming → warehouse leg: `foreachBatch` with a keyed
  * delete-then-insert per transaction is the standard idempotent JDBC
  * upsert — a replayed micro-batch (Structured Streaming's at-least-once
  * contract after a sink failure) must leave the table byte-identical,
  * not duplicated. Pinned against embedded Derby, same as the batch
  * JDBC staging specs.
  */
class StreamingJdbcSinkSpec extends AnyFunSuite with SparkTestSession {

  private val url = "jdbc:derby:memory:graftsink;create=true"

  System.setProperty("derby.stream.error.file",
    s"${System.getProperty("java.io.tmpdir")}/derby.log")

  private def upsertBatch(df: DataFrame, batchId: Long): Unit = {
    // local copy: the task closure must not capture the (unserializable)
    // suite instance through the `url` field
    val u = url
    // distributed: each partition opens its own connection and commits
    // one transaction; delete-then-insert by key makes replay a no-op
    df.foreachPartition { rows: Iterator[Row] =>
      val conn = DriverManager.getConnection(u)
      try {
        conn.setAutoCommit(false)
        val del = conn.prepareStatement("DELETE FROM sink_t WHERE k = ?")
        val ins = conn.prepareStatement(
          "INSERT INTO sink_t(k, v, batch) VALUES (?, ?, ?)")
        rows.foreach { r =>
          del.setLong(1, r.getLong(0))
          del.executeUpdate()
          ins.setLong(1, r.getLong(0))
          ins.setString(2, r.getString(1))
          ins.setLong(3, batchId)
          ins.executeUpdate()
        }
        conn.commit()
      } finally conn.close()
    }
  }

  private def tableRows(): Map[Long, (String, Long)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT k, v, batch FROM sink_t")
      Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => r.getLong(1) -> (r.getString(2), r.getLong(3)))
        .toMap // toMap also proves key uniqueness via the count check below
    } finally conn.close()
  }

  private def tableCount(): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT count(*) FROM sink_t")
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  test("foreachBatch keyed upsert is idempotent under micro-batch replay") {
    import spark.implicits._
    val setup = DriverManager.getConnection(url)
    try setup.createStatement().executeUpdate(
      "CREATE TABLE sink_t (k BIGINT PRIMARY KEY, v VARCHAR(64), batch BIGINT)")
    finally setup.close()

    implicit val sqlCtx = spark.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "v")
      .writeStream.foreachBatch(upsertBatch _).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(tableCount() == 2)

      // simulate the at-least-once failure mode: the SAME micro-batch
      // content is delivered again (sink crashed after commit, before
      // the checkpoint advanced) — the upsert must be a no-op
      upsertBatch(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 0L)
      assert(tableCount() == 2, "replayed batch duplicated rows")

      // later batch updates one key and adds another
      input.addData((2L, "b2"), (3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = tableRows()
    assert(tableCount() == 3 && rows.size == 3)
    assert(rows(1L)._1 == "a")
    assert(rows(2L)._1 == "b2") // updated in place, not appended
    assert(rows(3L)._1 == "c")
  }
}
