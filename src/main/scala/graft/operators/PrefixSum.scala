package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.InternalRowDataFrame
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed running total — the scan primitive behind order-dependent
  * pipeline steps (sequence packing, byte offsets, quota assignment)
  * that a naive `sum() OVER (ORDER BY ...)` window would funnel through
  * ONE task.
  *
  * Shape: range-repartition on the order column (partition i holds a
  * contiguous ascending range), sort within partitions, run one
  * lightweight job that ships a single long per partition to the driver
  * (the per-partition sums), then stamp `exclusiveOffset(partition) +
  * runningInPartition` in a narrow InternalRow pass. Both jobs read the
  * SAME shuffle output (stage reuse), so the range boundaries are
  * identical across them — the same guarantee [[SequentialIds]] relies
  * on via `zipWithIndex`.
  */
object PrefixSum {

  /** Append `totalCol` = inclusive running sum of `valueCol` (LongType)
    * in ascending `orderCol` order. `orderCol` must be a total order for
    * deterministic results; null values count as 0.
    */
  def withRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
      totalCol: String, numPartitions: Int = 0): DataFrame = {
    val sorted = SequentialIds.rangeSorted(df, orderCol, numPartitions)
    val valueIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(valueIdx).dataType == LongType,
      s"$valueCol must be LongType, was ${sorted.schema(valueIdx).dataType}")
    val schema = StructType(sorted.schema.fields :+
      StructField(totalCol, LongType, nullable = false))
    val types = sorted.schema.fields.map(_.dataType)
    val rdd = sorted.queryExecution.toRdd
    // job 1: one long per partition to the driver — O(partitions), never
    // O(rows)
    val sums = rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
      var s = 0L
      while (it.hasNext) {
        val r = it.next()
        if (!r.isNullAt(valueIdx)) s += r.getLong(valueIdx)
      }
      s
    })
    val offsets = sums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val bc = rdd.sparkContext.broadcast(offsets)
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        val vals = new Array[Any](types.length + 1)
        var j = 0
        while (j < types.length) { vals(j) = r.get(j, types(j)); j += 1 }
        if (!r.isNullAt(valueIdx)) acc += r.getLong(valueIdx)
        vals(types.length) = acc
        new GenericInternalRow(vals): InternalRow
      }
    }
    InternalRowDataFrame.create(df.sparkSession, stamped, schema)
  }
}
