package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType

/** Bridge into the `private[sql]` InternalRow-level DataFrame
  * constructor (`SparkSession.internalCreateDataFrame`), placed under
  * `org.apache.spark.sql` to satisfy the qualified-private access — the
  * standard pattern Spark-ecosystem libraries use for InternalRow-level
  * operators. Lets graft operators hand Tungsten rows straight back to
  * Catalyst without a detour through external `Row` marshalling.
  */
object InternalRowDataFrame {

  /** Wrap an `RDD[InternalRow]` (field order/types matching `schema`)
    * as a DataFrame. Rows must be safe to hand over — i.e. not a
    * buffer-reused `UnsafeRow` unless consumed element-wise (Spark's
    * `RDDScanExec` projects each row to unsafe form element-wise, so
    * freshly built `GenericInternalRow`s are always fine).
    */
  def create(spark: SparkSession, rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[ClassicSession].internalCreateDataFrame(rows, schema)
}
