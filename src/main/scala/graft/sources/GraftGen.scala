package graft.sources

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector: a deterministic generated table
  * (`spark.read.format("graftgen").option("rows", N).option("slices", P)`)
  * demonstrating the full connector contract the engine's external
  * sources rely on —
  *
  *  - **partition planning**: the id space [0, rows) splits into
  *    `slices` input partitions, each generated independently on an
  *    executor (no driver materialization at any N);
  *  - **filter pushdown** (`SupportsPushDownFilters`): id-range
  *    predicates narrow the generated interval EXACTLY, whole slices
  *    outside it are never planned, and the accepted filters are
  *    consumed (no residual re-filter in the Spark plan);
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *    materialize only the requested columns;
  *  - **vectorized (columnar) reads**: the batch path generates
  *    straight into on-heap column vectors (4096-row `ColumnarBatch`es,
  *    plan shows `ColumnarToRow`) like a vectorized parquet reader;
  *    `option("columnar", "false")` falls back to the row reader;
  *  - **runtime filtering** (`SupportsRuntimeFiltering`): when the scan
  *    feeds a join whose other side is selectively filtered, Spark's
  *    dynamic pruning hands the build side's id set to the scan between
  *    planning and execution; the scan narrows to the set's [min, max]
  *    envelope and drops whole slices — the DSv2 analogue of dynamic
  *    partition pruning on a partitioned file source.
  *
  * Row formula (replayed by the DuckDB oracle over `range()`):
  * `id BIGINT, text = 'w' || (id % 97), val = ((id*7) % 100) / 10.0`.
  * [[GraftGen.rowsGenerated]] counts generated rows so specs can assert
  * pruning happened physically, not just in the plan.
  */
class GraftGen extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graftgen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftGen.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GenTable
}

object GraftGen {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("val", DoubleType, nullable = false)))

  /** Rows physically generated across all readers (test observability;
    * local-mode executors share the JVM). */
  val rowsGenerated = new AtomicLong

  /** Input partitions dropped by RUNTIME filtering (dynamic pruning from
    * a join's build side) — observability for GraftGenSpec. Static
    * pushdown pruning does not count here. */
  val runtimePrunedPartitions = new AtomicLong

  /** The write half's in-memory store, keyed by the `table` option:
    * only rows from COMMITTED jobs appear — the driver-side
    * `BatchWrite.commit` installs task outputs atomically, so a failed
    * or aborted job leaves the previous table state untouched (the
    * connector commit protocol every real sink implements over object
    * stores / metastores). */
  val committed = new java.util.concurrent.ConcurrentHashMap[
    String, Vector[(Long, String, Double)]]()

  /** Streaming sink bookkeeping: epochs already applied, keyed by
    * (table, queryId). An epoch replayed after a failure/restart commits
    * again with the SAME (queryId, epochId) — the idempotency ledger is
    * what turns at-least-once delivery into exactly-once sink state.
    * The queryId component matters: it is stable across restarts of one
    * checkpoint but fresh for a NEW query reusing the table name, whose
    * epochs restart at 0 — without it those commits would be silently
    * swallowed as replays of the old query. */
  val committedEpochs = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Boolean]]()

  /** Composite ledger key; '#' cannot appear in a Spark query UUID. */
  def ledgerKey(table: String, queryId: String): String = s"$table#$queryId"
}

private class GenTable extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "graftgen"
  override def schema(): StructType = GraftGen.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(
      options.getLong("rows", 1000L),
      options.getInt("slices", 8),
      options.getLong("rowsPerBatch", 0L),
      options.getBoolean("columnar", true))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GenWriteBuilder(info.options.get("table"), info.queryId())
}

/** Batch-write half: per-task [[GenDataWriter]]s buffer rows and ship
  * them in their commit message; nothing becomes visible until the
  * driver's `commit(messages)` installs the union atomically. A task
  * abort simply drops the buffer, and `BatchWrite.abort` leaves the
  * store untouched — GraftGenSpec pins both visibility rules by driving
  * the writer/commit API directly.
  *
  * `SupportsTruncate` backs the TRUNCATE capability GenTable advertises
  * (`mode("overwrite")` in batch, Complete output mode in streaming):
  * a truncating commit REPLACES the table's committed state instead of
  * appending to it. */
private class GenWriteBuilder(table: String, queryId: String)
  extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GenBatchWrite(table, truncateFirst)
    override def toStreaming: StreamingWrite =
      new GenStreamingWrite(table, queryId, truncateFirst)
  }
}

/** Streaming sink with IDEMPOTENT epoch commits: Structured Streaming
  * guarantees each epoch's data is deterministic given the checkpointed
  * offsets, but a failure between sink commit and checkpoint write
  * means the epoch is REPLAYED — the sink must treat a repeated
  * (epochId) commit as a no-op or state duplicates. The per-table epoch
  * ledger here is the same pattern as the JDBC upsert sink's
  * transactional batch-id table. */
private[sources] class GenStreamingWrite(table: String, queryId: String,
    truncate: Boolean = false) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] = new GenDataWriter
    }
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val ledger = GraftGen.committedEpochs.computeIfAbsent(
      GraftGen.ledgerKey(table, queryId),
      _ => new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Boolean]())
    if (ledger.putIfAbsent(epochId, java.lang.Boolean.TRUE) == null) {
      val all = messages.flatMap {
        case GenCommit(rows) => rows
        case _ => Nil
      }.toVector
      if (truncate) GraftGen.committed.put(table, all) // Complete mode
      else GraftGen.committed.merge(table, all, (a, b) => a ++ b)
    } // replayed epoch: already applied, exactly-once preserved
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class GenBatchWrite(table: String,
    truncate: Boolean = false) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GenWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.flatMap {
      case GenCommit(rows) => rows
      case _ => Nil
    }.toVector
    if (truncate) GraftGen.committed.put(table, all)
    else GraftGen.committed.merge(table, all, (a, b) => a ++ b)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private case class GenCommit(rows: Seq[(Long, String, Double)])
  extends WriterCommitMessage

private class GenWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GenDataWriter
}

private[sources] class GenDataWriter extends DataWriter[InternalRow] {
  private val buf = Vector.newBuilder[(Long, String, Double)]
  override def write(r: InternalRow): Unit =
    buf += ((r.getLong(0), r.getUTF8String(1).toString, r.getDouble(2)))
  override def commit(): WriterCommitMessage = GenCommit(buf.result())
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

private class GenScanBuilder(rows: Long, slices: Int, rowsPerBatch: Long,
    columnar: Boolean)
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GraftGen.Schema
  private var aggFuncs: Option[Seq[String]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case GreaterThan("id", _: java.lang.Long) => true
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case EqualTo("id", _: java.lang.Long) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThan("id", v: java.lang.Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: java.lang.Long) =>
        lo = math.max(lo, v)
      case LessThan("id", v: java.lang.Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: java.lang.Long) =>
        hi = math.min(hi, v + 1)
      case EqualTo("id", v: java.lang.Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    accepted = ours
    residual // id-range filters are applied EXACTLY -> no residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- COMPLETE aggregate pushdown (SupportsPushDownAggregates): the
  // generator knows its (filter-narrowed) id interval in closed form,
  // so global count(*)/min(id)/max(id) are metadata answers — count =
  // hi-lo, min = lo, max = hi-1 — the same trick real sources play
  // with footer stats / catalog counts. Complete (not partial): the
  // scan returns the FINAL one-row answer and Spark plans no
  // re-aggregation; sound because the pushed id-range filters were
  // accepted exactly (no residual — Spark only offers aggregates to a
  // source whose remaining filters it fully consumed). Physically
  // ZERO rows are generated (GraftGenSpec pins via rowsGenerated).
  private def translate(agg: Aggregation): Option[Seq[String]] =
    if (agg.groupByExpressions.nonEmpty) None
    else {
      def isId(e: org.apache.spark.sql.connector.expressions.Expression) =
        e match {
          case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
          case _ => false
        }
      val fs = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => Some("count")
        case m: Min if isId(m.column) => Some("min")
        case m: Max if isId(m.column) => Some("max")
        case _ => None
      }
      if (fs.nonEmpty && fs.forall(_.isDefined)) Some(fs.map(_.get)) else None
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    aggFuncs = translate(agg)
    aggFuncs.isDefined
  }

  override def build(): Scan = aggFuncs match {
    case Some(fs) => new GenAggScan(lo, math.max(lo, hi), fs)
    case None =>
      new GenScan(lo, math.max(lo, hi), rows, slices, required, rowsPerBatch,
        columnar)
  }
}

private case class GenAggPartition(funcs: Seq[String], lo: Long, hi: Long)
  extends InputPartition

/** One-row scan carrying a completely-pushed aggregation's answer. */
private class GenAggScan(lo: Long, hi: Long, funcs: Seq[String])
  extends Scan with Batch {

  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (f, i) => StructField(s"agg_$i", LongType, nullable = f != "count")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graftgen agg-pushdown [$lo, $hi) funcs=${funcs.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GenAggPartition(funcs, lo, hi))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val gp = p.asInstanceOf[GenAggPartition]
        new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean = if (done) false else { done = true; true }
          override def get(): InternalRow = {
            val vals: Array[Any] = gp.funcs.map {
              case "count" => gp.hi - gp.lo
              case "min" => if (gp.hi > gp.lo) gp.lo else null
              case _ => if (gp.hi > gp.lo) gp.hi - 1 else null
            }.toArray
            new GenericInternalRow(vals)
          }
          override def close(): Unit = ()
        }
      }
    }
}

private class GenScan(lo: Long, hi: Long, rows: Long, slices: Int,
    required: StructType, rowsPerBatch: Long, columnar: Boolean = false)
  extends Scan with Batch
  with SupportsRuntimeFiltering {

  // [rlo, rhi): the id range after RUNTIME narrowing. Runtime filters
  // arrive between planning and execution (BatchScanExec re-plans its
  // partitions through filter()), are semantically redundant — the join
  // that produced them still applies — so the scan may over-return:
  // narrowing an IN set to its [min, max] envelope is sound, and
  // ignoring an untranslatable filter is too.
  private var rlo: Long = lo
  private var rhi: Long = hi

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[java.lang.Long]) =>
      val longs = vs.map(_.asInstanceOf[java.lang.Long].longValue())
      rlo = math.max(rlo, longs.min)
      rhi = math.min(rhi, longs.max + 1)
    case EqualTo("id", v: java.lang.Long) =>
      rlo = math.max(rlo, v); rhi = math.min(rhi, v + 1)
    case _ => () // advisory: unhandled runtime filters are safe to skip
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenMicroBatchStream(lo, hi, slices, required, rowsPerBatch)
  override def description(): String =
    s"graftgen [$lo, $hi) of $rows, slices=$slices, " +
      s"columns=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    // fixed slice boundaries over the FULL id space (like file splits),
    // keeping only slices intersecting the pushed range
    val per = math.max(1L, (rows + slices - 1) / slices)
    def slicesIn(a0: Long, b0: Long) =
      (0L until rows by per)
        .map(s => (math.max(s, a0), math.min(s + per, b0)))
        .filter { case (a, b) => a < b }
    val statically = slicesIn(lo, hi)
    val planned = slicesIn(rlo, rhi)
    GraftGen.runtimePrunedPartitions.addAndGet(
      (statically.size - planned.size).toLong)
    planned.map { case (a, b) => GenPartition(a, b): InputPartition }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // columnar applies to the BATCH path only; the micro-batch stream
    // below constructs its own row-based factory
    new GenReaderFactory(required, columnar)
}

private case class GenPartition(start: Long, end: Long) extends InputPartition

/** Micro-batch half of the connector: the id space is the offset axis.
  * Offsets are plain longs persisted in the streaming checkpoint, so a
  * restarted query resumes exactly after the last committed id.
  * Admission control (`rowsPerBatch`) bounds each micro-batch; with
  * Trigger.AvailableNow the engine drains [committed, hi) in
  * rowsPerBatch-sized batches and stops. Each batch's id interval is
  * sliced into input partitions like the batch scan. */
private class GenMicroBatchStream(lo: Long, hi: Long, slices: Int,
    required: StructType, rowsPerBatch: Long)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private case class GenOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  // SupportsTriggerAvailableNow (extends SupportsAdmissionControl):
  // without it, AvailableNow degrades to Trigger.Once — one unbounded
  // batch that IGNORES the read limit. The bounded generator's "all
  // available data" target is simply hi.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): Offset = GenOffset(lo)
  override def deserializeOffset(json: String): Offset =
    GenOffset(json.toLong)
  override def getDefaultReadLimit: ReadLimit =
    if (rowsPerBatch > 0) ReadLimit.maxRows(rowsPerBatch)
    else ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the entry point")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GenOffset].v
    limit match {
      case mr: ReadMaxRows => GenOffset(math.min(hi, s + mr.maxRows()))
      case _ => GenOffset(hi)
    }
  }
  override def reportLatestOffset(): Offset = GenOffset(hi)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (a, b) = (start.asInstanceOf[GenOffset].v, end.asInstanceOf[GenOffset].v)
    val per = math.max(1L, (b - a + slices - 1) / slices)
    (a until b by per)
      .map(s => GenPartition(s, math.min(s + per, b)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class GenReaderFactory(required: StructType,
    columnar: Boolean = false)
  extends PartitionReaderFactory {

  /** Vectorized read path: rows are generated straight into on-heap
    * column vectors in 4096-row batches, so downstream whole-stage
    * codegen consumes the scan through the columnar fast path (the plan
    * shows `ColumnarToRow`, like a vectorized parquet scan) instead of
    * one virtual call per row. Row formula and [[GraftGen.rowsGenerated]]
    * accounting are identical to the row path. */
  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  override def createColumnarReader(
      p: InputPartition): PartitionReader[ColumnarBatch] = {
    val gp = p.asInstanceOf[GenPartition]
    new PartitionReader[ColumnarBatch] {
      private var pos = gp.start
      private var batch: ColumnarBatch = null
      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        if (pos >= gp.end) false
        else {
          val n = math.min(4096L, gp.end - pos).toInt
          val vecs = OnHeapColumnVector.allocateColumns(n, required)
          required.fields.zipWithIndex.foreach { case (f, c) =>
            var i = 0
            f.name match {
              case "id" =>
                while (i < n) { vecs(c).putLong(i, pos + i); i += 1 }
              case "text" =>
                while (i < n) {
                  val b = ("w" + ((pos + i) % 97))
                    .getBytes(java.nio.charset.StandardCharsets.UTF_8)
                  vecs(c).putByteArray(i, b, 0, b.length); i += 1
                }
              case _ =>
                while (i < n) {
                  vecs(c).putDouble(i, (((pos + i) * 7) % 100).toDouble / 10.0)
                  i += 1
                }
            }
          }
          GraftGen.rowsGenerated.addAndGet(n.toLong)
          batch = new ColumnarBatch(
            vecs.map(v => v: ColumnVector).toArray, n)
          pos += n
          true
        }
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit =
        if (batch != null) { batch.close(); batch = null }
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var id = gp.start - 1
      private val fields = required.fieldNames
      override def next(): Boolean = { id += 1; id < gp.end }
      override def get(): InternalRow = {
        GraftGen.rowsGenerated.incrementAndGet()
        InternalRow.fromSeq(fields.map {
          case "id" => id
          case "text" => UTF8String.fromString("w" + (id % 97))
          case "val" => ((id * 7) % 100).toDouble / 10.0
        }.toSeq)
      }
      override def close(): Unit = ()
    }
  }
}
