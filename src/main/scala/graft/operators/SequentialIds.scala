package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
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
  */
object SequentialIds {

  /** Prepend `idCol` = first, first+1, ... in ascending `orderCol` order.
    * `orderCol` must be a total order (ties would make ids
    * nondeterministic across runs).
    */
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

  def assign(df: DataFrame, orderCol: String, idCol: String,
      first: Long, numPartitions: Int = 0): DataFrame = {
    val sorted = rangeSorted(df, orderCol, numPartitions)
    val schema = StructType(
      StructField(idCol, LongType, nullable = false) +: sorted.schema.fields)
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((first + i) +: r.toSeq)
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}
