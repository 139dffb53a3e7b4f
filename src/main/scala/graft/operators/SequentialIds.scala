package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.InternalRowDataFrame
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed sequential-id assignment — the engine-scale replacement
  * for a Postgres sequence + `RETURNING`
  * (reference sql/import_original_triage_needs_and_notes.sql:1-39;
  * SURVEY.md §7.3.6).
  *
  * A global `row_number() OVER (ORDER BY ord)` funnels every row through
  * a single task. This produces the SAME ids with per-partition offsets:
  * range-repartition on the order column (partition i holds a contiguous
  * ord range, ranges ascending with i), sort within each partition, then
  * `zipWithIndex` — Spark counts the partitions in one lightweight extra
  * job and each task stamps `first + partitionOffset + localIndex` with
  * no cross-partition data movement beyond the range exchange.
  *
  * The stamping runs at the InternalRow level (`queryExecution.toRdd` →
  * prepend the id → hand back via [[InternalRowDataFrame]]), so rows
  * never round-trip through external `Row` objects — no
  * serialize/deserialize tax on what is otherwise a narrow pass.
  */
object SequentialIds {

  /** The distributed pre-id stage (exposed for plan tests).
    * numPartitions <= 0 → planner default (AQE may coalesce small data).
    */
  private[graft] def rangeSorted(df: DataFrame, orderCol: String,
      numPartitions: Int): DataFrame = {
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, col(orderCol))
      else df.repartitionByRange(col(orderCol))
    ranged.sortWithinPartitions(col(orderCol))
  }

  /** Prepend `idCol` = first, first+1, ... in ascending `orderCol` order.
    * `orderCol` must be a total order (ties would make ids
    * nondeterministic across runs).
    */
  def assign(df: DataFrame, orderCol: String, idCol: String,
      first: Long, numPartitions: Int = 0): DataFrame = {
    val sorted = rangeSorted(df, orderCol, numPartitions)
    val schema = StructType(
      StructField(idCol, LongType, nullable = false) +: sorted.schema.fields)
    val types = sorted.schema.fields.map(_.dataType)
    val rows = sorted.queryExecution.toRdd.zipWithIndex().map { case (r, i) =>
      // copy field values out of the (possibly buffer-reused) UnsafeRow
      // into a fresh GenericInternalRow; consumed element-wise by the
      // scan's unsafe projection downstream
      val vals = new Array[Any](types.length + 1)
      vals(0) = first + i
      var j = 0
      while (j < types.length) { vals(j + 1) = r.get(j, types(j)); j += 1 }
      new GenericInternalRow(vals): InternalRow
    }
    InternalRowDataFrame.create(df.sparkSession, rows, schema)
  }
}
